package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

/** Streaming ingest equals the batch aggregation on the same static input
  * (availableNow drains everything) — the continuous twin of the
  * reference's finite bulk-load job.
  */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  /** Raw `ts` arrives as a nano-epoch long only when the parquet was
    * written with TIMESTAMP(NANOS) (read under `nanosAsLong=true`);
    * µs-precision testdata already lands as a proper timestamp. Mirror
    * the conditional conversion `Tables.events` applies.
    */
  private def tsToTimestamp(df: org.apache.spark.sql.DataFrame) =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(
        call_function("div", col("ts"), lit(1000L))))
    else df

  test("availableNow hourly counts equal the batch aggregation") {
    import spark.implicits._
    val batchEvents = Tables.events(spark, sf)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    // file streams need a directory: stage the parquet into a temp landing dir
    val landing = java.nio.file.Files.createTempDirectory("graft_stream_")
    raw.write.mode("overwrite").parquet(landing.toString)
    val stream = tsToTimestamp(StreamingIngest.readParquetStream(
        spark, landing.toString, raw.schema))
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

  test("stream-stream funnel join: inclusive window bounds, per-user " +
      "pairing, equals the batch join") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // synthetic boundary corpus: user 1's purchases at +0s, exactly +6h,
    // and +6h+1µs after the view; user 2 purchases but never views; the
    // +6h+1µs row must be excluded by the CLOSED upper bound
    val h6us = 6L * 3600L * 1000000L
    val base = 1700000000000000L
    val rows = Seq(
      (1L, base, 10L, "view"),
      (1L, base, 20L, "purchase"),          // same instant: included
      (1L, base + h6us, 21L, "purchase"),   // exactly +6h: included
      (1L, base + h6us + 1L, 22L, "purchase"), // +6h+1µs: excluded
      (2L, base + 60L, 30L, "purchase"))    // no view: unmatched
    val landing = java.nio.file.Files.createTempDirectory("graft_ssj_spec_")
    rows.toDF("user_id", "t_us", "event_id", "event_type")
      .select($"user_id", timestamp_micros($"t_us").as("ts"),
        $"event_id", $"event_type")
      .write.mode("overwrite").parquet(landing.toString)
    val schema = spark.read.parquet(landing.toString).schema
    val stream = spark.readStream.schema(schema).parquet(landing.toString)
    val joined = graft.streaming.StreamJoin
      .funnel(stream, "view", "purchase", "6 hours")
      .select($"a_id", $"b_id")
    val q = StreamingIngest.runAvailableNowAppend(joined, "graft_ssj_spec")
    q.awaitTermination(120000)
    val got = spark.table("graft_ssj_spec")
      .orderBy($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((10L, 20L), (10L, 21L)))
  }

  test("streaming partitioned parquet sink: one directory per time bucket") {
    import spark.implicits._
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val landing = java.nio.file.Files.createTempDirectory("graft_psink_in_")
    raw.write.mode("overwrite").parquet(landing.toString)
    val outDir = java.nio.file.Files.createTempDirectory("graft_psink_out_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_psink_ck_")
    val stream = tsToTimestamp(StreamingIngest.readParquetStream(
        spark, landing.toString, raw.schema))
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
