package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale guards (SURVEY §5): the physical plans must show filter/column
  * pushdown, broadcast joins for dims, and whole-stage codegen — the
  * properties that keep these operators viable at 100 TB.
  */
class PlanSpec extends AnyFunSuite with SparkFixture {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("map-only ETL pushes filters and prunes columns at the parquet scan") {
    val plan = physical(Queries.etlMapOnly(spark, sf))
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("GreaterThanOrEqual(l_quantity,10.0)"), plan.take(2000))
    // pruned read schema: no l_tax/l_suppkey in the scan
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("l_tax"))
  }

  test("dimension joins broadcast (q5: nation/region never shuffle the fact)") {
    val plan = physical(Queries.q5RegionRevenue(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("time-bucket aggregation is one shuffle with map-side partial agg") {
    val plan = physical(Queries.partitionDayOrders(spark, sf))
    assert(plan.contains("HashAggregate"))
    // partial + final HashAggregate around a single bucket Exchange; the
    // sort for ORDER BY adds its own range exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"want 1 hash exchange, plan:\n${plan.take(3000)}")
  }

  test("cohort retention reuses ONE fact exchange across aggs and join") {
    // disable AQE for this plan: AQE's runtime broadcast conversion hides
    // the static exchange-reuse proof (at scale the SMJ path is the one
    // that matters, and it must reuse the repartition(u) exchange)
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = physical(Queries.cohortRetention(spark, sf))
      assert(plan.contains("ReusedExchange"), plan.take(3000))
      val repart = "REPARTITION_BY_COL".r.findAllIn(plan).length
      assert(repart >= 1, plan.take(3000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("corr_exact is one HashAggregate pass — no sort/object agg") {
    val plan = physical(Queries.corrExactQ(spark, sf))
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("SortAggregate"), plan.take(2000))
    assert(!plan.contains("ObjectHashAggregate"), plan.take(2000))
  }

  test("histogram/winsorize broadcast the per-group frame back — the fact never shuffles for the join") {
    Seq(Queries.histogramValues(spark, sf),
        Queries.winsorizeClip(spark, sf)).foreach { df =>
      val plan = physical(df)
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
      assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    }
  }

  test("LSH dedup paths never plan an all-pairs join") {
    Seq(Queries.dedupMinhash(spark, sf),
        Queries.dedupJaccardExact(spark, sf),
        Queries.dedupSimhash(spark, sf)).foreach { df =>
      val plan = physical(df)
      assert(!plan.contains("CartesianProduct"), plan.take(1500))
      assert(!plan.contains("BroadcastNestedLoop"), plan.take(1500))
    }
  }

  test("quality_bands plans no per-stratum single-task window sort") {
    val df = Queries.qualityBands(spark, sf)
    df.collect()
    val plan = physical(df)
    // the two-level rank runs inside Banding's checkpointed stage keyed by
    // the range-partition id; the final plan must carry NO window at all —
    // a Window node here would mean a per-language (single-task) sort crept
    // back into the corpus-sized path
    assert(!plan.contains("ntile"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("table_checksum is one narrow map + one HashAggregate — no joins") {
    val plan = physical(Queries.tableChecksumQ(spark, sf))
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("Join"), plan.take(2000))
    assert(!plan.contains("SortAggregate"), plan.take(2000))
  }

  test("heavy_words recount filters candidates BEFORE the aggregation") {
    val plan = physical(Queries.heavyWords(spark, sf))
    // the InSet/In candidate filter must sit below the count agg: no
    // aggregation over the full vocabulary ever plans
    val aggIdx = plan.indexOf("HashAggregate")
    val filterIdx = math.max(plan.indexOf(" IN ("), plan.indexOf("INSET"))
    assert(aggIdx >= 0 && filterIdx >= 0, plan.take(2000))
    // executed-plan strings print top-down: the filter that appears
    // AFTER the aggregate in the text is below it in the tree
    assert(filterIdx > aggIdx, plan.take(3000))
  }

  test("golden_record is one aggregation pass — no window exec") {
    // the string payload (last_type) rides the max_by buffer, so the agg
    // demotes to SortAggregate — the documented E23 variable-width trade;
    // the guard is that NO per-column WindowExec passes plan, and the
    // whole record resolves in a single aggregation
    val plan = physical(Queries.goldenRecord(spark, sf))
    assert(plan.contains("Aggregate"), plan.take(2000))
    assert(!plan.contains("WindowExec"), plan.take(2000))
    assert(!plan.contains("WindowGroupLimit"), plan.take(2000))
    assert("SortAggregate|HashAggregate".r.findAllIn(plan).length <= 4,
      plan.take(3000)) // partial+final of ONE agg (AQE may print both)
  }

  test("chi_square reuses the cells exchange across marginal branches") {
    // static-plan proof like the cohort guard: AQE's runtime stage reuse
    // hides ReusedExchange from the pre-execution string
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = physical(Queries.chiSquareQ(spark, sf))
      assert(plan.contains("ReusedExchange"), plan.take(3000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("equidepth/mad cutoffs broadcast back — fact never shuffles for the join") {
    Seq(Queries.equidepthHist(spark, sf),
        Queries.madOutliers(spark, sf)).foreach { df =>
      val plan = physical(df)
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
      assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    }
  }

  test("decontaminate_fuzzy never self-joins the corpus band table") {
    // assert on the un-checkpointed inner plan (the public entry hides the
    // joins behind a localCheckpoint): both joins must be broadcast — the
    // eval band table into the corpus band scan, then the candidate ids
    // back over the corpus shingle scan — so the corpus side plans ZERO
    // hash-partition exchanges (= zero corpus shuffles, no self-join)
    val docs = Tables.documents(spark, sf)
    val corpusSh = docs.where(col("doc_id") >= 50)
      .select(col("doc_id").as("id_b"),
        graft.operators.Dedup.shingles(col("text"), 3).as("sh"))
    val df = graft.operators.Dedup.minhashCrossPairsPlan(corpusSh,
      docs.where(col("doc_id") < 50), col("doc_id"), col("text"),
      threshold = 0.5, n = 3, k = 64, bands = 32, rowsPerBand = 2)
    df.collect()
    val plan = physical(df)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("ShuffledHashJoin"), plan.take(3000))
    // the only hash exchanges allowed are the candidate distinct's own
    // (candidate-sized, feeding the broadcast), never a corpus-scan child
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("knn_label_ivf scores candidates through the cell equi-join, " +
      "never a corpus x query nested loop") {
    val df = Queries.knnLabelIvf(spark, sf)
    df.collect()
    val plan = physical(df)
    // the brute-force twin (knn_label) is a BroadcastNestedLoopJoin by
    // design; the IVF path must instead join probes to indexed cells on
    // the `cell` key (hash-joinable) and argmax through TopKPerKey
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("TopKPerKey"), plan.take(3000))
  }

  test("scd2_history: one exchange and one sort serve both windows") {
    // the change-point filter between lag and lead/row_number is narrow
    // and order-preserving — a second Exchange or Sort would mean the
    // filter broke partitioning/ordering reuse and the operator pays the
    // shuffle twice at scale
    val plan = physical(Queries.scd2History(spark, sf))
    // drop the final ORDER BY's range exchange+sort from the count
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "(?m)^[^\\n]*\\bSort \\[".r.findAllIn(plan).length
    assert(hashEx === 1, s"want 1 hash exchange:\n${plan.take(3000)}")
    assert(sorts <= 2, // one window sort + the output ORDER BY's sort
      s"want <=2 sorts (window + output order):\n${plan.take(3000)}")
  }

  test("allocate_rebate: one fact exchange serves all three windows") {
    // total/base-sum/rank windows all hash on l_orderkey; a second fact
    // exchange would mean the window chain re-shuffles per stage
    val plan = physical(Queries.allocateRebate(spark, sf))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx <= 2, // join exchange pair counts once per side
      s"windows must share the orderkey partitioning:\n${plan.take(3000)}")
    assert(plan.contains("PushedFilters"), plan.take(2000))
  }

  test("max_concurrency: the only unpartitioned ordered window is |days|-sized") {
    // the sweep's running sum must be partitioned by day; one global
    // Window over the delta frame would funnel the timeline through a
    // single task at scale. The day-carry window (over the day-total
    // frame) is the single allowed SinglePartition sort.
    val plan = physical(Queries.maxConcurrency(spark, sf))
    val single = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(single <= 1, s"want <=1 single-partition exchange:\n${plan.take(3000)}")
    assert(plan.contains("Window"), plan.take(2000))
  }

  test("basket_rules joins pairs on the basket key — no cartesian product") {
    val plan = physical(Queries.basketBrandRules(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the two support join-backs and the census ride broadcast
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("tfidf_topterms takes the bounded-heap TopKPerKeyExec path") {
    val df = Queries.tfidfTopterms(spark, sf)
    df.collect()
    val plan = physical(df)
    assert(plan.contains("TopKPerKey"), plan.take(3000))
  }

  test("AQE splits the hot key of a skewed fact-fact join (skew=true), " +
      "and leaves it whole when skew handling is off") {
    import spark.implicits._
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    try {
      // production defaults detect skew at 256 MB partitions; scale the
      // thresholds to the fixture so the same AQE rule fires on ~5 MB
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      // fact side: ~95% of 200k rows on key 0, with a payload so the hot
      // shuffle partition is megabytes; dim-ish side still fact-shaped
      // (too big to broadcast with the threshold off)
      // skew detection sees COMPRESSED shuffle bytes — hash the payload so
      // the hot partition's size survives lz4
      def fact = spark.range(200000).select(
        when($"id" % 20 =!= 0, lit(0L)).otherwise($"id").as("k"),
        sha2(concat(lit("payload-"), $"id".cast("string")), 256).as("payload"))
      def dim = spark.range(2000).select($"id".as("k"), lit("d").as("d"))
      // execute through the frame's own QueryExecution so AQE finalizes
      // it; aggregate OVER the payload so column pruning can't slim the
      // hot partition under the detection threshold
      val j = fact.join(dim, "k").agg(sum(length($"payload")))
      assert(j.collect().head.getLong(0) > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.contains("skew=true"), plan.take(2000))
      // control: same join with skew handling disabled keeps one giant
      // partition (no skew=true marker)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val j2 = fact.join(dim, "k").agg(sum(length($"payload")))
      assert(j2.collect().head.getLong(0) > 0)
      assert(!j2.queryExecution.executedPlan.toString.contains("skew=true"))
    } finally restore()
  }

  test("cms estimate joins the grid BROADCAST — probes never shuffle") {
    import spark.implicits._
    val items = (1 to 50).flatMap(i => Seq.fill(100 / i)(s"w$i")).toDF("t")
    val cells = graft.operators.CountMin.sketch(items, col("t"))
    val est = graft.operators.CountMin
      .estimate(cells, items.distinct(), col("t"))
    est.collect()
    val plan = physical(est)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("triangle census: size-gated broadcast — hinted below the edge bound, plain equi-joins above, identical results") {
    import spark.implicits._
    val edges = (for { a <- 0L to 30L; b <- 0L to 30L if a < b }
      yield (a, b)).toDF("a", "b")
    // small path: the measured edge count is under the bound, so the
    // degree/adjacency probes carry explicit broadcast hints and the edge
    // stream never shuffles after its distinct
    val te = graft.operators.Triangles.triangleEdges(edges, col("a"), col("b"))
    val small = te.collect()
    val planSmall = physical(te)
    assert(planSmall.contains("BroadcastHashJoin"), planSmall.take(3000))
    assert(!planSmall.contains("CartesianProduct"), planSmall.take(3000))
    // big-graph path (bound forced to 0): the r13 pin (broadcast only)
    // enforced an edge-sized adjacency broadcast — an OOM at real graph
    // scale. Above the bound every probe is a key equi-join; a cartesian
    // or nested-loop pair stream must never appear on either path, and
    // results are bit-identical
    val teBig = graft.operators.Triangles.triangleEdges(edges,
      col("a"), col("b"), maxBroadcastEdges = 0L)
    val big = teBig.collect()
    assert(big.map(_.toString).sorted.toSeq ===
      small.map(_.toString).sorted.toSeq)
    val planBig = physical(teBig)
    assert(!planBig.contains("CartesianProduct"), planBig.take(3000))
    assert(!planBig.contains("BroadcastNestedLoopJoin"), planBig.take(3000))
  }

  test("retrieval_rrf: query vector broadcasts; both arm cuts ride TopKPerKey") {
    val df = Queries.retrievalRrf(spark, sf)
    df.collect()
    val plan = physical(df)
    // the semantic arm's 1-row query vector crosses as a broadcast NLJ
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("TopKPerKey"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("sliding percentiles: compact (hour, value) reduce feeds the " +
      "window explode — two exchanges, codegen'd first agg") {
    // static plan (no collect): the executed AQE string would print the
    // final AND initial plans and double-count the exchanges. r16 shape:
    // the fact reduces to per-(hour, value) counts in a codegen'd
    // long-key HashAggregate (exchange 1, corpus-sized input but
    // value-domain-capped output), and the frequency-weighted exact
    // percentile runs over the 3-window explode of that compact frame
    // (exchange 2, |hours × values × 3| rows) — the corpus never reaches
    // the ObjectHashAggregate (measured: 300× 18–22 s → 1.3 s steady,
    // and the old form's ±4× GC-churn variance gone with it).
    val df = Queries.slidingPercentile(spark, sf)
    val plan = physical(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 2, s"want 2 hash exchanges, got $exchanges:\n${plan.take(3000)}")
    // the corpus-facing first aggregate must be whole-stage codegen'd
    // (long keys), not the object path
    assert(plan.contains("HashAggregate"), plan.take(3000))
  }

  test("flagship queries keep whole-stage codegen in the hot path") {
    // AQE finalizes the physical plan lazily — execute first. Codegen'd
    // operators print with a `*(stageId)` prefix in the final plan.
    val df = Queries.q1Pricing(spark, sf)
    df.collect()
    val plan = physical(df)
    assert(plan.contains("*(1)"), plan.take(2000))
    // scan → filter → project → partial agg all fused in one codegen stage
    assert(plan.contains("*(1) HashAggregate"), plan.take(2000))
  }
}
