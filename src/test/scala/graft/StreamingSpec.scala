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

  test("streaming partitioned parquet sink: one directory per time bucket") {
    import spark.implicits._
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val landing = java.nio.file.Files.createTempDirectory("graft_psink_in_")
    raw.write.mode("overwrite").parquet(landing.toString)
    val outDir = java.nio.file.Files.createTempDirectory("graft_psink_out_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_psink_ck_")
    val stream = StreamingIngest.readParquetStream(
        spark, landing.toString, raw.schema)
      .withColumn("ts", timestamp_micros(
        call_function("div", col("ts"), lit(1000L))))
      .withColumn("bucket", graft.operators.TimePartitioning
        .bucket($"ts", graft.operators.TimePartitioning.Day))
    // the reference's signature map -> shuffle-by-bucket -> reduce-side
    // files contract, continuously: partitionBy on the streaming sink
    val q = stream.writeStream
      .format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckpt.toString)
      .partitionBy("bucket")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val dirs = new java.io.File(outDir.toString).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("bucket="))
      .sorted
    val expected = Tables.events(spark, sf)
      .select(graft.operators.TimePartitioning
        .bucket($"ts", graft.operators.TimePartitioning.Day).as("b"))
      .distinct().collect().map(r => s"bucket=${r.getLong(0)}").sorted
    assert(dirs.toSeq === expected.toSeq)
    assert(spark.read.parquet(outDir.toString).count() === raw.count())
  }
}
