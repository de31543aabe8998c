package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

/** Streaming ingest equals the batch aggregation on the same static input
  * (availableNow drains everything) — the continuous twin of the
  * reference's finite bulk-load job.
  */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  test("availableNow hourly counts equal the batch aggregation") {
    import spark.implicits._
    val batchEvents = Tables.events(spark, sf)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    // file streams need a directory: stage the parquet into a temp landing dir
    val landing = java.nio.file.Files.createTempDirectory("graft_stream_")
    raw.write.mode("overwrite").parquet(landing.toString)
    val stream = StreamingIngest.readParquetStream(
        spark, landing.toString, raw.schema)
      .withColumn("ts", timestamp_micros(
        call_function("div", col("ts"), lit(1000L))))
    val q = StreamingIngest.runAvailableNow(
      StreamingIngest.hourlyCounts(stream), "graft_stream_test")
    q.awaitTermination(120000)
    val got = spark.table("graft_stream_test")
      .select($"hour_start", $"event_type", $"n")
      .orderBy($"hour_start", $"event_type").collect()
    val want = StreamingIngest.hourlyCounts(batchEvents)
      .select($"hour_start", $"event_type", $"n")
      .orderBy($"hour_start", $"event_type").collect()
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }
}
