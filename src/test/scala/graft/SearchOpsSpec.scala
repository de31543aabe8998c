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
}
