package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CountMin

/** Specs for the E65/L36/L37/E6g batch: Count-Min sketch guarantees and
  * mergeability, reciprocal-rank fusion, vocabulary growth, sliding
  * exact percentiles.
  */
class CountMinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // ------------------------------------------------- Count-Min sketch ----

  private lazy val zipf = (1 to 40).flatMap(i => Seq.fill(400 / i)(s"w$i"))
  private lazy val zipfDf = zipf.toDF("t")

  test("cms estimates are one-sided: est >= exact for every item") {
    val cells = CountMin.sketch(zipfDf, col("t"))
    val probes = zipfDf.distinct()
    val est = CountMin.estimate(cells, probes, col("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = zipf.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (t, f) =>
      assert(est(t) >= f, s"$t est=${est(t)} < exact=$f")
    }
  }

  test("cms error is bounded by the total stream mass per colliding cell") {
    // est - exact is the collision mass of the item's best cell; with
    // d=4 rows over w=256 buckets and ~40 distinct items, at least one
    // row should isolate every heavy item on this stream (deterministic
    // hashes — this pins the current md5 layout, not a probability)
    val cells = CountMin.sketch(zipfDf, col("t"))
    val est = CountMin.estimate(cells, zipfDf.distinct(), col("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = zipf.groupBy(identity).view.mapValues(_.size.toLong)
    val heavy = exact.filter(_._2 >= 100)
    heavy.foreach { case (t, f) =>
      assert(est(t) == f, s"heavy $t est=${est(t)} != exact=$f")
    }
  }

  test("cms cells are additive: sketch(a ++ b) == cellwise sum") {
    val (a, b) = zipf.splitAt(zipf.size / 2)
    val whole = CountMin.sketch(zipfDf, col("t"))
    val parts = CountMin.sketch(a.toDF("t"), col("t"))
      .unionByName(CountMin.sketch(b.toDF("t"), col("t")))
      .groupBy(col("j"), col("b")).agg(sum(col("cnt")).as("cnt"))
    assert(whole.exceptAll(parts).isEmpty && parts.exceptAll(whole).isEmpty)
  }

  test("weighted sketch over per-item counts equals the stream sketch") {
    val weighted = CountMin.sketchWeighted(
      zipfDf.groupBy(col("t")).agg(count(lit(1)).as("c")),
      col("t"), col("c"))
    val stream = CountMin.sketch(zipfDf, col("t"))
    assert(weighted.exceptAll(stream).isEmpty
      && stream.exceptAll(weighted).isEmpty)
  }

  test("wide grids reach every bucket; w=256 keeps the historical layout") {
    // pre-fix, bucket() always read exactly 2 nibbles, so any w > 256
    // left buckets >= 256 permanently empty and silently halved the
    // effective width. Now the nibble count grows with w.
    val items = (1 to 4096).map(i => s"item$i").toDF("t")
    val wide = 1024
    val buckets = items
      .select(CountMin.bucket(col("t"), 0, wide).as("b"))
      .agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
      .collect()(0)
    assert(buckets.getLong(0) >= 0L && buckets.getLong(1) >= 256L,
      s"w=$wide never exceeded bucket 255 — width silently truncated")
    // the default 256-wide grid is bit-identical to the 2-nibble layout
    val legacy = items.select(
      CountMin.bucket(col("t"), 0, 256).as("b"),
      conv(substring(md5(concat_ws(":", lit("0"), col("t"))), 1, 2),
        16, 10).cast("long").as("b2"))
      .where(col("b") =!= col("b2"))
    assert(legacy.isEmpty)
    // absurd widths are rejected loudly, not silently degraded
    intercept[IllegalArgumentException] {
      CountMin.bucket(col("t"), 0, (1 << 24) + 1)
    }
  }

  test("absent items estimate as their cells' collision mass (>= 0)") {
    val cells = CountMin.sketch(zipfDf, col("t"))
    val absent = Seq("never-seen-1", "never-seen-2").toDF("t")
    CountMin.estimate(cells, absent, col("t")).collect().foreach { r =>
      assert(r.getLong(1) >= 0L)
    }
  }

  // ------------------------------------------- reciprocal-rank fusion ----

  test("retrieval_rrf fuses both arms and keeps rank order") {
    val out = Queries.retrievalRrf(spark, sf).collect()
    assert(out.length == 10)
    // fused_rank is 1..10 in order, rrf non-increasing
    assert(out.map(_.getLong(4)).toSeq == (1L to 10L))
    val rrfs = out.map(_.getDouble(3)).toSeq
    assert(rrfs.zip(rrfs.tail).forall { case (x, y) => x >= y })
    // every fused row carries at least one arm's rank
    out.foreach(r => assert(!r.isNullAt(1) || !r.isNullAt(2)))
    // a doc ranked #1 in one arm always outscores a doc outside both lists:
    // 1/(60+1) > 0 — so the top fused row must hold a rank-1 somewhere
    val topRow = out.head
    assert(topRow.getLong(4) == 1L)
  }

  // ------------------------------------------------- vocabulary growth ----

  test("vocab_growth is cumulative-monotone and ends at corpus totals") {
    val out = Queries.vocabGrowth(spark, sf).collect()
    val cum = out.map(r => (r.getLong(1), r.getLong(2)))
    cum.zip(cum.tail).foreach { case ((t1, v1), (t2, v2)) =>
      assert(t2 > t1 && v2 >= v1)
    }
    val toks = Tables.documents(spark, sf).select(
      explode(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("t"))
    assert(cum.last._1 == toks.count())
    assert(cum.last._2 == toks.distinct().count())
  }

  // ------------------------------------------ sliding exact percentiles ----

  test("sliding_percentile covers each event in exactly 3 windows") {
    val out = Queries.slidingPercentile(spark, sf)
    val nEvents = Tables.events(spark, sf).count()
    assert(out.agg(sum(col("n"))).collect()(0).getLong(0) == 3 * nEvents)
    // window starts are hour-aligned and per-window p50 <= p95
    out.collect().foreach { r =>
      assert(r.getLong(0) % 3600000000L == 0L)
      assert(r.getDouble(2) <= r.getDouble(3))
    }
  }
}
