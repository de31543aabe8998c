package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Cohort, Compaction, Funnel, Indexing, PageRank, Profile, Reconcile, Stats, TimeSeries}

/** Specs for the r11 engine-op batches: NFC canonicalization (+fuzz),
  * CDC merge (semantics + aggregate-exec guard), inverted index,
  * histogram, winsorize, cohort retention, exact correlation, funnel,
  * integer PageRank, rolling distinct, TWAP, snapshot diff, and the
  * streaming CDC COW sink.
  */
class EngineOpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // ------------------------------------------------------- nfc_clean ------

  test("nfcClean composes decomposed sequences and collapses controls") {
    val rows = Seq(
      "née",             // e + combining acute -> é
      "Zürich",          // u + combining diaeresis -> ü
      "a\tb\u000B\u000Bc",     // controls collapse to single spaces
      " \u001F lead/trail \u0000 ",
      "",
      "café")             // already composed: unchanged
      .toDF("t")
    val got = rows.select(
      graft.functions.NormalizeFunctions.nfcClean($"t").as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("née", "Zürich", "a b c", "lead/trail",
      "", "café"))
  }

  test("nfcClean interpreted eval equals the codegen path and keeps nulls") {
    val df = Seq(Some("x́ \t y"), None).toDF("t")
    val expr = graft.functions.NfcClean(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("t")))
    // interpreted
    val interp = df.select(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(expr).as("c"))
    assert(interp.collect().map(r =>
      Option(r.getString(0))).toSeq === Seq(Some("x́ y"), None))
    // non-string input rejected at analysis
    intercept[Exception] {
      Seq(1L).toDF("t").select(
        graft.functions.NormalizeFunctions.nfcClean($"t")).collect()
    }
  }

  test("nfcClean fuzz: kernel equals the two-step reference on adversarial unicode") {
    val rnd = new scala.util.Random(4242)
    val combining = Seq('́', '̈', '̊', '̧', '̣')
    val controls = (0 to 0x1F).map(_.toChar) :+ '\u007F'
    val letters = "aeiouncszAEOU" + "äöüéàçñ" + "汉字ひらμ"
    def randString(): String = {
      val n = rnd.nextInt(40)
      val sb = new StringBuilder
      for (_ <- 0 until n) rnd.nextInt(10) match {
        case 0 | 1 => sb += combining(rnd.nextInt(combining.length))
        case 2 | 3 => sb += controls(rnd.nextInt(controls.length))
        case 4     => sb += ' '
        case _     => sb += letters(rnd.nextInt(letters.length))
      }
      sb.toString
    }
    def reference(s: String): String =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
        .replaceAll("[\\x00-\\x20\\x7F]+", " ").trim
    val cases = (1 to 500).map(_ => randString())
    val got = cases.toDF("t")
      .select(graft.functions.NormalizeFunctions.nfcClean($"t").as("c"))
      .collect().map(_.getString(0)).toSeq
    val want = cases.map(reference)
    assert(got === want)
    // idempotence: cleaning cleaned text is the identity
    val twice = got.toDF("t")
      .select(graft.functions.NormalizeFunctions.nfcClean($"t").as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(twice === got)
  }

  // ---------------------------------------------------- mergeChangelog ----

  test("mergeChangelog applies latest op per key: upsert, delete, insert") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, 1L, "U", "b2", 21.0),   // update existing
      (3L, 1L, "D", null, 0.0),    // delete existing
      (4L, 1L, "U", "d", 40.0),    // insert new key
      (5L, 1L, "U", "e", 50.0),    // insert then delete in same batch
      (5L, 2L, "D", null, 0.0),
      (6L, 1L, "D", null, 0.0))    // delete of a key that never existed
      .toDF("k", "seq", "op", "s", "v")
    val got = Compaction.mergeChangelog(base, changes, "k", "seq", "op",
        Seq("s", "v"))
      .orderBy($"k").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0)))
  }

  test("mergeChangelog keeps the highest-seq change when a key repeats") {
    val base = Seq((1L, 1.0)).toDF("k", "v")
    val changes = Seq((1L, 1L, "U", 2.0), (1L, 3L, "U", 4.0),
      (1L, 2L, "U", 3.0)).toDF("k", "seq", "op", "v")
    val got = Compaction.mergeChangelog(base, changes, "k", "seq", "op",
      Seq("v")).collect()
    assert(got.length === 1 && got(0).getDouble(1) === 4.0)
  }

  test("mergeChangelog with all-numeric payload stays a HashAggregate") {
    val base = Seq((1L, 1.0)).toDF("k", "v")
    val changes = Seq((2L, 1L, "U", 2.0)).toDF("k", "seq", "op", "v")
    val merged = Compaction.mergeChangelog(base, changes, "k", "seq", "op",
      Seq("v"))
    merged.collect()
    val plan = merged.queryExecution.executedPlan.toString
    // the byte-encoded op keeps the extremum buffer fixed-width
    assert(plan.contains("HashAggregate"), plan.take(2000))
    assert(!plan.contains("SortAggregate"), plan.take(2000))
  }

  // ---------------------------------------------------- invertedIndex -----

  test("invertedIndex: df counts docs once, postings sorted, cap applies") {
    val docs = Seq(
      (10L, "alpha beta alpha gamma"),
      (3L, "beta alpha"),
      (7L, "beta delta"),
      (8L, "epsilon"))
      .toDF("doc_id", "text")
    val got = Indexing.invertedIndex(docs, col("doc_id"), col("text"),
        minDf = 2L, maxPostings = 2)
      .orderBy($"term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    // alpha: docs {3,10}; beta: {3,7,10} capped at 2 lowest ids; others df=1
    assert(got === Seq(("alpha", 2L, "3,10"), ("beta", 3L, "3,7")))
  }

  // ------------------------------------------------------- histogram ------

  test("histogram: equi-width bins, max in last bin, degenerate group") {
    val df = Seq(("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 4.0),
      ("b", 7.0), ("b", 7.0)).toDF("g", "v")
    val got = Profile.histogram(df, col("g"), col("v"), 4)
      .orderBy($"g", $"bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // a: range [0,4], width 1: 0->bin0, 1->bin1, 2->bin2, 4->bin3 (max)
    // b: degenerate (hi==lo): all in bin 0, bin_lo == lo
    assert(got === Seq(("a", 0L, 1L, 0.0), ("a", 1L, 1L, 1.0),
      ("a", 2L, 1L, 2.0), ("a", 3L, 1L, 3.0), ("b", 0L, 2L, 7.0)))
  }

  // ------------------------------------------------------- winsorize ------

  test("winsorize: clip counts and exact decimal clipped mass") {
    // ten values 1..10: p0.05/p0.95 interpolate to 1.45 / 9.55
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Profile.winsorize(df, col("g"), col("v"), 0.05, 0.95)
      .collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("n_clip_lo") === 1L) // value 1 < 1.45
    assert(r.getAs[Long]("n_clip_hi") === 1L) // value 10 > 9.55
    assert(math.abs(r.getAs[Double]("p_lo") - 1.45) < 1e-12)
    assert(math.abs(r.getAs[Double]("p_hi") - 9.55) < 1e-12)
    // clipped sum = 1.45 + 2..9 + 9.55 = 55 - 1 - 10 + 1.45 + 9.55 = 55.0
    assert(r.getAs[Double]("clipped_sum") === 55.0)
  }

  // ------------------------------------------------------ cohort ----------

  test("cohort retention counts distinct users per (cohort, offset)") {
    val day = 86400000000L
    def ts(d: Long) = new java.sql.Timestamp(d * 86400000L)
    val ev = Seq(
      (1L, ts(0)), (1L, ts(0)), (1L, ts(2)),  // cohort 0, offsets {0, 2}
      (2L, ts(0)), (2L, ts(1)),               // cohort 0, offsets {0, 1}
      (3L, ts(1)))                            // cohort 1, offset {0}
      .toDF("user_id", "ts")
    val got = Cohort.retention(ev, col("user_id"), col("ts"), day)
      .orderBy($"cohort_p", $"offset_p").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L)))
  }

  // ------------------------------------------------------ corr_exact ------

  test("corrExact matches the closed form and built-in corr to 1e-9") {
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 3L), ("g", 3.0, 2L),
      ("g", 4.0, 5L), ("g", 5.0, 4L)).toDF("g", "x", "y")
    val r = Stats.corrExact(df, col("g"), col("x"), col("y")).collect()(0)
    val builtin = df.agg(corr($"x", $"y"), covar_samp($"x", $"y")).collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(math.abs(r.getAs[Double]("corr") - builtin.getDouble(0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("covar_samp") - builtin.getDouble(1))
      < 1e-9)
  }

  test("corrExact is invariant to partitioning (the claim corr() can't make)") {
    val base = (1 to 400).map(i => ("g", i * 0.25 + (i % 7), (i % 24).toLong))
    val a = Stats.corrExact(base.toDF("g", "x", "y").repartition(1),
      col("g"), col("x"), col("y")).collect()(0)
    val b = Stats.corrExact(base.toDF("g", "x", "y").repartition(13),
      col("g"), col("x"), col("y")).collect()(0)
    assert(a.getAs[Double]("corr") === b.getAs[Double]("corr"))
    assert(a.getAs[Double]("covar_samp") === b.getAs[Double]("covar_samp"))
  }

  // ---------------------------------------------------------- funnel ------

  test("funnel counts strict-order completions only") {
    def t(us: Long) = new java.sql.Timestamp(us / 1000) // µs -> ms grid
    val ev = Seq(
      (1L, "view", 1000000L), (1L, "click", 2000000L),
      (1L, "purchase", 3000000L),                   // full chain
      (2L, "view", 1000000L), (2L, "click", 1000000L), // same instant: click
                                                       // NOT after view
      (3L, "click", 1000000L), (3L, "purchase", 2000000L), // never viewed
      (4L, "view", 5000000L), (4L, "click", 4000000L)) // click before view
      .map { case (u, et, us) => (u, et, t(us)) }
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.steps(ev, col("user_id"), col("event_type"), col("ts"),
        Seq("view", "click", "purchase"))
      .orderBy($"step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1, "view", 3L), (2, "click", 1L),
      (3, "purchase", 1L)))
  }

  // -------------------------------------------------------- pagerank ------

  test("integer pagerank: hand-computed 3-cycle and partitioning invariance") {
    // directed 3-cycle a->b->c->a, outdeg 1 everywhere: ranks stay 1.0
    // (base 150000 + 85% of a full unit share = 1000000 exactly)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r1 = PageRank.iterate(cyc, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r1 === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    // star 1->{2,3}: after one round, 2 and 3 each get 150000 + 425000;
    // 1 gets only base. Second round: 1 still receives nothing (no
    // in-edges), 2/3 receive 150000's share halved...
    val star = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val r2 = PageRank.iterate(star, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r2 === Map(1L -> 150000L, 2L -> 575000L, 3L -> 575000L))
    // partitioning invariance: integer arithmetic can't drift
    val big = (1L to 200L).map(i => (i, i % 50 + 1)).toDF("src", "dst")
    val p1 = PageRank.iterate(big.repartition(1), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val p13 = PageRank.iterate(big.repartition(13), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(p1 === p13)
  }

  // ------------------------------------------------- rolling distinct -----

  test("rollingDistinct: trailing window, partial leading, max-day cut") {
    val day = 86400000000L
    def ts(d: Long) = new java.sql.Timestamp(d * 86400000L)
    // user 1 active days {0, 2}; user 2 active day {2}
    val ev = Seq((1L, ts(0)), (1L, ts(0)), (1L, ts(2)), (2L, ts(2)))
      .toDF("user_id", "ts")
    val got = TimeSeries.rollingDistinct(ev, col("user_id"), col("ts"),
        day, windowDays = 3)
      .orderBy($"day_bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // day 0: {1}; day 1: {1} (from day 0); day 2: {1 (day 0 and 2), 2}
    // days 3, 4 are past max day -> cut
    assert(got === Seq((0L, 1L), (1L, 1L), (2L, 2L)))
  }

  // ---------------------------------------------------------- twap --------

  test("twap: holding-time weights, single-event users drop") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0), 10.0), (1L, ts(10), 20.0), (1L, ts(40), 99.0),
      // user 1: 10.0 held 10 s, 20.0 held 30 s -> (100 + 600) / 40 = 17.5
      (2L, ts(0), 5.0)) // single event: no gap, drops
      .toDF("user_id", "ts", "value")
    val got = TimeSeries.twap(ev, col("user_id"), col("ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSeq
    assert(got === Seq((1L, 2L, 17.5)))
  }

  // ------------------------------------------------------ snapshot diff ---

  test("snapshotDiff classifies unchanged/modified/deleted/inserted") {
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)).toDF("k", "s", "v")
    val rebuilt = Seq((1L, "a", 1.0),   // unchanged
      (2L, "B", 2.0),                   // s modified
      (3L, "c", 30.0),                  // v modified
      (5L, "e", 5.0))                   // inserted; 4 deleted
      .toDF("k", "s", "v")
    val r = Reconcile.snapshotDiff(base, rebuilt, "k", Seq("s", "v"))
      .collect()(0)
    assert(r.getAs[Long]("n_unchanged") === 1L)
    assert(r.getAs[Long]("n_modified") === 2L)
    assert(r.getAs[Long]("n_deleted") === 1L)
    assert(r.getAs[Long]("n_inserted") === 1L)
    assert(r.getAs[Long]("diff_s") === 1L)
    assert(r.getAs[Long]("diff_v") === 1L)
  }

  // ------------------------------------------------- streaming CDC --------

  test("cdcMergeSink: versioned COW snapshots equal the batch merge") {
    import graft.streaming.StreamingIngest
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_spec_")
    val landing = s"$tmp/landing"; val snap = s"$tmp/snap"
    val ckpt = s"$tmp/ckpt"
    val b0 = Seq((1L, 0L, "U", 10.0), (2L, 0L, "U", 20.0))
      .toDF("k", "seq", "op", "v")
    val b1 = Seq((2L, 1L, "U", 21.0), (1L, 1L, "D", 0.0),
      (3L, 1L, "U", 30.0)).toDF("k", "seq", "op", "v")
    b0.write.mode("overwrite").parquet(landing)
    def drain(): Unit = StreamingIngest.cdcMergeSink(
      spark.readStream.schema(b0.schema).parquet(landing),
      "k", "seq", "op", Seq("v"), snap,
      checkpointDir = Some(ckpt), availableNow = true).awaitTermination()
    drain()
    b1.write.mode("append").parquet(landing)
    drain()
    val versions = spark.read.parquet(snap)
    val vmax = versions.agg(max($"version")).collect()(0)
      .get(0).asInstanceOf[Number].longValue
    val last = versions.where($"version" === vmax).select($"k", $"v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(last === Set((2L, 21.0), (3L, 30.0))) // 1 deleted, 2 updated
    // version 0 (pre-changes) is still readable — time travel by version
    val v0 = versions.where($"version" === 0).select($"k", $"v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(v0 === Set((1L, 10.0), (2L, 20.0)))
  }
}
