package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Specs for the E24b/E68/L39 batch: positional phrase search,
  * time-to-convert percentiles, cross-source calibrated quality.
  */
class SearchOpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def stageDocs(rows: Seq[(Long, String, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sos_")
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp.toString
  }

  test("phrase search counts OVERLAPPING occurrences and skips bag-of-words hits") {
    val dir = stageDocs(Seq(
      // two overlapping "row column sort" + one isolated
      (1L, "row column sort row column sort x row column sort", "en", "a"),
      // all three words present but never consecutive: no match
      (2L, "row x column y sort row sort column", "en", "a"),
      (3L, "nothing here", "en", "a")))
    val out = Queries.phraseSearch(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((3L, 0L)))
    assert(!out.contains(2L) && !out.contains(3L))
  }

  test("time_to_convert uses the LAST view before each purchase") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ttc_")
    Seq(
      (1L, "view", 10L * 1000000L, 5L, 0.0),
      (2L, "view", 50L * 1000000L, 5L, 0.0),
      (3L, "purchase", 100L * 1000000L, 5L, 1.0),
      (4L, "purchase", 40L * 1000000L, 5L, 1.0), // only the t=10 view precedes
      (5L, "purchase", 7L * 1000000L, 6L, 1.0))  // no prior view: drops
      .toDF("event_id", "event_type", "t_us", "user_id", "value")
      .select(col("event_id"), col("event_type"),
        timestamp_micros(col("t_us")).as("ts"), col("user_id"),
        col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Queries.timeToConvert(spark, tmp.toString).collect()
    // both surviving purchases land in hour 0; latencies 50 s and 30 s
    assert(out.length == 1)
    assert(out(0).getLong(1) == 2L)
    assert(out(0).getDouble(2) == 40.0) // p50 of {30, 50}
  }

  test("calibrated deciles partition each source and enable uniform cuts") {
    val out = Queries.qualityCalibrated(spark, sf).collect()
    val bySource = out.groupBy(_.getString(0))
    val docs = Tables.documents(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rows) =>
      // deciles in range, per-source counts conserve
      rows.foreach(r => assert(r.getLong(1) >= 0L && r.getLong(1) <= 9L))
      assert(rows.map(_.getLong(2)).sum == docs(src))
      // "top 20% of each source" = deciles 8-9 ≈ n/5 (±2 for rank ties
      // at the bucket boundary)
      val top = rows.filter(_.getLong(1) >= 8L).map(_.getLong(2)).sum
      assert(math.abs(top - docs(src) / 5.0) <= 2.0,
        s"$src top-quintile=$top n=${docs(src)}")
    }
  }

  private def stageEvents(rows: Seq[(Long, String, Long, Long)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_seq_")
    rows.toDF("event_id", "event_type", "t_s", "user_id")
      .select(col("event_id"), col("event_type"),
        timestamp_micros(col("t_s") * 1000000L).as("ts"), col("user_id"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp.toString
  }

  test("seq_pattern extracts view→click→purchase chains with per-link windows") {
    val day = 86400L
    val dir = stageEvents(Seq(
      // user 5: two complete chains sharing the same view/click
      (1L, "view", 10L, 5L), (2L, "click", 20L, 5L),
      (3L, "purchase", 30L, 5L), (4L, "purchase", 40L, 5L),
      // user 6: click but never a view → no chain
      (5L, "click", 100L, 6L), (6L, "purchase", 110L, 6L),
      // user 7: view→click gap beyond 24 h → middle link breaks
      (7L, "view", 0L, 7L), (8L, "click", day + 3600L, 7L),
      (9L, "purchase", day + 3610L, 7L),
      // user 8: purchase with no click at all
      (10L, "purchase", 50L, 8L)))
    val out = Queries.seqPattern(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(out(5L) == ((2L, 2L, 30L))) // widest chain: purchase t=40, view t=10
    assert(out(6L) == ((1L, 0L, -1L)))
    assert(out(7L) == ((1L, 0L, -1L)))
    assert(out(8L) == ((1L, 0L, -1L)))
  }

  test("stream_cusum partial-commit drains land on the batch series") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_scus_")
    // three days of orders with a level shift on the third
    (1L to 40L).map { k =>
      val day = if (k <= 10) 0L else if (k <= 20) 1L else 2L
      (k, day * 86400L + k)
    }.toDF("o_orderkey", "t_s")
      .select(col("o_orderkey"),
        timestamp_micros(col("t_s") * 1000000L).as("o_orderdate"))
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val streamed = Queries.streamCusum(spark, tmp.toString).collect()
    val batch = Queries.cusumDaily(spark, tmp.toString).collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(streamed.length == 3)
  }

  test("bpe_fertility groups by predicted language with conserved sums") {
    val dir = stageDocs(Seq(
      (1L, "the cat of and is here", "en", "a"),
      (2L, "the dog of and is there", "en", "a"),
      (3L, "der hund und die katze ist", "de", "b")))
    val out = Queries.bpeFertility(spark, dir).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("de", "en"))
    val byLang = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(byLang("en")._1 == 2L && byLang("de")._1 == 1L)
    assert(byLang("en")._3 == 12L && byLang("de")._3 == 6L) // whitespace words
    out.foreach { r =>
      // fertility is exactly the int/int division of the reported sums,
      // and BPE never emits fewer tokens than whitespace words here
      assert(r.getDouble(4) == r.getLong(2).toDouble / r.getLong(3).toDouble)
      assert(r.getLong(2) >= r.getLong(3))
    }
  }

  test("session_paths orders within session, splits at gaps, caps at 12") {
    val gap = 1800L
    val longRun = (0 until 15).map(i =>
      (100L + i, "click", 50000L + i, 7L)) // one 15-event session
    val dir = stageEvents(Seq(
      (1L, "view", 10L, 5L), (2L, "click", 20L, 5L),
      (3L, "purchase", 20L + gap + 1L, 5L), // > gap after t=20: own session
      (4L, "view", 10L, 6L), (5L, "click", 20L, 6L)) ++ longRun)
    val out = Queries.sessionPaths(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("view>click") == 2L)
    assert(out("purchase") == 1L)
    val capped = out.keys.find(_.startsWith("click>click")).get
    assert(capped.split(">").length == 12) // 15-event session truncates
  }

  test("dedup_stats histogram conserves docs and shares") {
    val out = Queries.dedupStats(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == nDocs)
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
      assert(r.getDouble(3) == r.getLong(2).toDouble / nDocs.toDouble)
    }
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-9)
  }

  test("weighted_percentiles p50 equals the weighted median") {
    val med = Queries.weightedMedian(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val out = Queries.weightedPercentiles(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (m, n) = med(r.getString(0))
      assert(r.getLong(2) == m && r.getLong(4) == n)
      // quartiles are monotone
      assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3))
    }
  }

  test("ngram_coverage scores eval docs against the train bigram set") {
    val dir = stageDocs(Seq(
      // doc 10 and 20 are eval (mod 10 == 0); 1..3 are train
      (1L, "alpha beta gamma", "en", "a"),
      (2L, "beta gamma delta", "en", "a"),
      (3L, "epsilon zeta", "en", "a"),
      // bigrams: alpha>beta (train), beta>gamma (train), gamma>zeta (no)
      (10L, "alpha beta gamma zeta", "en", "a"),
      // single token: no bigrams, drops
      (20L, "alpha", "en", "a")))
    val out = Queries.ngramCoverage(spark, dir).collect()
    assert(out.length == 1 && out(0).getLong(0) == 10L)
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 2L)
    assert(out(0).getDouble(3) == 2.0 / 3.0)
  }

  test("quantile_mergeable estimates sit within one bin of the exact truth") {
    val out = Queries.quantileMergeable(spark, sf).collect()(0)
    val width = out.getLong(1)
    val exact = Tables.orders(spark, sf)
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("x"))
      .agg(expr("percentile(x, 0.5)").as("p50"),
        expr("percentile(x, 0.9)").as("p90"),
        expr("percentile(x, 0.99)").as("p99")).collect()(0)
    // the true quantile lies inside the selected bin: |est - exact| ≤ width
    Seq(2 -> exact.getDouble(0), 3 -> exact.getDouble(1),
        4 -> exact.getDouble(2)).foreach { case (i, ex) =>
      assert(math.abs(out.getLong(i) - ex) <= width.toDouble,
        s"col $i est=${out.getLong(i)} exact=$ex width=$width")
    }
  }

  test("user_lifecycle splits active users into new vs returning") {
    val day = 86400L
    val dir = stageEvents(Seq(
      (1L, "view", 10L, 5L), (2L, "view", 20L, 6L),       // day 0: both new
      (3L, "view", day + 10L, 5L), (4L, "view", day + 20L, 7L), // day 1
      (5L, "view", day + 30L, 5L)))                       // same user+day dedups
    val out = Queries.userLifecycle(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0L) == ((2L, 2L, 0L, 2L)))
    assert(out(1L) == ((2L, 1L, 1L, 3L))) // user 7 new, user 5 returning
  }

  test("activity_streaks finds the longest consecutive-day run per user") {
    val day = 86400L
    val dir = stageEvents(Seq(
      // user 5: days 0,1,2 then 5,6 → best streak 3 starting day 0
      (1L, "view", 0L, 5L), (2L, "view", day, 5L), (3L, "view", 2 * day, 5L),
      (4L, "view", 5 * day, 5L), (5L, "view", 6 * day, 5L),
      // user 6: two singleton days → best 1, earliest start wins the tie
      (6L, "view", 3 * day, 6L), (7L, "view", 7 * day, 6L)))
    val out = Queries.activityStreaks(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(5L) == ((5L, 2L, 3L, 0L)))
    assert(out(6L) == ((2L, 2L, 1L, 3L)))
  }

  test("prefix_dup groups docs sharing the 16-word opening") {
    val opening = (1 to 16).map(i => s"tok$i").mkString(" ")
    val dir = stageDocs(Seq(
      (1L, s"$opening unique tail one", "en", "a"),
      (2L, s"$opening different ending", "en", "a"),
      (3L, "another document entirely with plenty of its own words here", "en", "a"),
      (4L, "short doc", "en", "a"))) // < 8 tokens: excluded
    val out = Queries.prefixDup(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
  }

  test("containment catches a nested doc whose Jaccard stays low") {
    val core = "one two three four five six seven eight nine ten"
    val tail =
      (1 to 40).map(i => s"w$i").mkString(" ") // dilutes Jaccard, not overlap
    val dir = stageDocs(Seq(
      (1L, core, "en", "a"),
      (2L, s"$core $tail", "en", "a"),
      (3L, "unrelated text entirely different words here", "en", "a")))
    val cont = Queries.containmentPairsQ(spark, dir).collect()
    assert(cont.length == 1)
    assert(cont(0).getLong(0) == 1L && cont(0).getLong(1) == 2L)
    assert(cont(0).getDouble(2) == 1.0) // all of doc 1's shingles nest in 2
    // the same pair is INVISIBLE to symmetric Jaccard at θ=0.5
    val jac = operators.Dedup.jaccardPairs(
      Tables.documents(spark, dir), col("doc_id"), col("text"),
      block = col("lang"), threshold = 0.5).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("ks_drift D statistic is exact on a hand-built two-sample grid") {
    // source a: lengths {2,2,4}; source b: lengths {4,6} → n_a=3, n_b=2
    // supports: cum_a over {2,4,6} = 2,3,3; cum_b = 0,1,2
    // |cum_a*2 - cum_b*3| = |4-0|,|6-3|,|6-6| = 4,3,0 → D = 4/6
    val dir = stageDocs(Seq(
      (1L, "a b", "en", "src_a"), (2L, "c d", "en", "src_a"),
      (3L, "e f g h", "en", "src_a"),
      (4L, "i j k l", "en", "src_b"), (5L, "m n o p q r", "en", "src_b")))
    val r = Queries.ksDrift(spark, dir).collect()(0)
    assert(r.getString(0) == "src_a" && r.getString(1) == "src_b")
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 4L)
    assert(r.getDouble(5) == 4.0 / 6.0)
  }

  test("ab_test_report counts arms and conversions exactly") {
    val dir = stageEvents(Seq(
      (1L, "view", 10L, 2L), (2L, "purchase", 20L, 2L), // arm 0, converts
      (3L, "view", 10L, 4L),                            // arm 0, no
      (4L, "view", 10L, 3L), (5L, "purchase", 20L, 3L), // arm 1, converts
      (6L, "view", 10L, 5L), (7L, "view", 20L, 5L)))    // arm 1, no
    val r = Queries.abTestReport(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 2L, 1L)))
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 0.5)
    assert(r.getDouble(6) == 0.0) // identical rates: zero association
  }

  test("embedding_health census is exact on a hand-quantized frame") {
    val out = Queries.embeddingHealth(spark, sf).collect()
    assert(out.length == 64 && out.map(_.getLong(0)).toSeq == (0L until 64L))
    val n = Tables.embeddings(spark, sf).count()
    out.foreach { r =>
      assert(r.getLong(1) == n)
      // mean/variance are exactly the declared expressions of the sums
      val (sq, n2) = (r.getLong(2).toDouble, r.getLong(1).toDouble)
      assert(r.getDouble(5) == sq / n2 / 1048576.0)
      assert(r.getDouble(6) >= 0.0)
      // the split q² halves recompose exactly: hi·2³⁰ + lo ≥ 0, lo < 2³⁰
      // per addend — and the recomposed mean-square upper-bounds mean²
      // (Jensen), which is the variance ≥ 0 check in integer form
      assert(r.getLong(3) >= 0L && r.getLong(4) >= 0L)
    }
  }

  test("rfm_segments quintiles are balanced and conserve customers") {
    val out = Queries.rfmSegments(spark, sf).collect()
    val total = out.map(_.getLong(3)).sum
    val nCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(total == nCust)
    // each axis's marginal is a (near-)even quintile split
    Seq(0, 1, 2).foreach { axis =>
      val marginal = out.groupBy(_.getLong(axis))
        .map { case (s, rows) => s -> rows.map(_.getLong(3)).sum }
      assert(marginal.keys.forall(s => s >= 1L && s <= 5L))
      marginal.values.foreach(v =>
        assert(math.abs(v - nCust / 5.0) <= 1.0, s"axis $axis: $marginal"))
    }
  }
}
