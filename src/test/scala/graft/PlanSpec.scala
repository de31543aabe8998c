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

  test("tfidf_topterms takes the bounded-heap TopKPerKeyExec path") {
    val df = Queries.tfidfTopterms(spark, sf)
    df.collect()
    val plan = physical(df)
    assert(plan.contains("TopKPerKey"), plan.take(3000))
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
