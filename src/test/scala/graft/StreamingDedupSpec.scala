package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

/** Streaming exact dedup: duplicate keys are dropped across microbatches
  * (state carries), and the watermark bounds the state.
  */
class StreamingDedupSpec extends AnyFunSuite with SparkFixture {

  test("duplicates across microbatches are dropped while state is live") {
    import spark.implicits._
    val input = MemoryStream[(Long, Long)](spark)
    val stream = input.toDS().toDF("doc_key", "sec")
      .select($"doc_key", timestamp_seconds($"sec").as("ts"))
    val q = StreamingIngest.dedupStream(stream, Seq("doc_key"))
      .writeStream.format("memory").queryName("graft_dedup_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, 100L), (2L, 120L), (1L, 100L)) // in-batch dup
      q.processAllAvailable()
      assert(spark.table("graft_dedup_stream").count() === 2)
      input.addData((1L, 100L), (3L, 140L)) // cross-batch dup + new key
      q.processAllAvailable()
      val keys = spark.table("graft_dedup_stream")
        .select($"doc_key").collect().map(_.getLong(0)).sorted
      assert(keys.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("dedupWithinWatermark: retry duplicates drop, key carries no ts") {
    import spark.implicits._
    val input = MemoryStream[(Long, Long)](spark)
    val stream = input.toDS().toDF("event_id", "sec")
      .select($"event_id", timestamp_seconds($"sec").as("ts"))
    val name = s"graft_wmdedup_unit_${System.nanoTime()}"
    val q = StreamingIngest
      .dedupWithinWatermark(stream, Seq("event_id"), "ts", "10 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // the at-least-once retry shape: same id delivered twice in-batch
      // and again (within the delay) next batch
      input.addData((1L, 100L), (2L, 130L), (1L, 100L))
      q.processAllAvailable()
      input.addData((1L, 100L), (3L, 200L))
      q.processAllAvailable()
      val ids = spark.table(name).select($"event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionWindowCounts splits only at gap > window (boundary merges)") {
    import spark.implicits._
    val input = MemoryStream[(Long, Long)](spark)
    val stream = input.toDS().toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val name = s"graft_sesswin_unit_${System.nanoTime()}"
    val q = StreamingIngest
      .sessionWindowCounts(stream, "user_id", "ts", "30 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      val gap = 1800L * 1000000L
      // touching windows MERGE: an event exactly AT the gap boundary
      // stays in the session (split only at diff > gap) — the same
      // convention as the batch sessionize
      input.addData((1L, 0L), (1L, gap), (2L, 0L), (2L, gap + 1L))
      q.processAllAvailable()
      val out = spark.table(name)
        .select($"user_id", $"start_us", $"n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(r => (r._1, r._2))
      assert(out.toSeq ===
        Seq((1L, 0L, 2L), (2L, 0L, 1L), (2L, gap + 1L, 1L)))
    } finally q.stop()
  }

  test("sessionWindowCountsAppend emits a session once after the watermark passes its close") {
    import spark.implicits._
    val input = MemoryStream[(Long, Long)](spark)
    val stream = input.toDS().toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val name = s"graft_sesswin_app_${System.nanoTime()}"
    val q = StreamingIngest
      .sessionWindowCountsAppend(stream, "user_id", "ts",
        gap = "30 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val gap = 1800L * 1000000L
      def rows() = spark.table(name)
        .select($"user_id", $"start_us", $"n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(r => (r._1, r._2)).toSeq
      // boundary event merges (split at gap >, not ≥ — the batch
      // sessionize convention the complete-mode test pins)
      input.addData((1L, 0L), (1L, gap))
      q.processAllAvailable()
      // watermark still behind the session's close → nothing emitted yet
      assert(rows() === Seq.empty)
      // advancer: watermark passes user 1's close (gap + 30min + 1min);
      // its session emits ONCE; the advancer's own session stays open
      input.addData((9L, 3L * gap))
      q.processAllAvailable()
      assert(rows() === Seq((1L, 0L, 2L)))
      // further advance: no re-emission (state was evicted), and a LATE
      // event behind the watermark is dropped, not resurrected as a new
      // session for user 1
      input.addData((1L, gap / 2L), (9L, 6L * gap))
      q.processAllAvailable()
      assert(rows() === Seq((1L, 0L, 2L), (9L, 3L * gap, 1L)))
    } finally q.stop()
  }

  test("foreachBatch incremental dedup: corpus state carries across batches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_incdedup_")
    val fpDir = s"$tmp/fps"
    val outDir = s"$tmp/out"
    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDS().toDF("doc_id", "text")
    val q = StreamingIngest.incrementalDedupSink(
      stream, "doc_id", "text", fpDir, outDir)
    try {
      input.addData((1L, "aa"), (2L, "bb"))
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).count() === 2)
      // "bb" already in corpus; "cc" dups within batch -> keep id 3
      input.addData((10L, "bb"), (3L, "cc"), (4L, "cc"), (5L, "dd"))
      q.processAllAvailable()
      val out = spark.read.parquet(outDir)
        .select($"keep_id").collect().map(_.getLong(0)).sorted
      assert(out.toSeq === Seq(1L, 2L, 3L, 5L))
      // fingerprint table holds exactly the distinct contents seen
      assert(spark.read.parquet(fpDir).distinct().count() === 4)
    } finally q.stop()
  }

  test("bucketed incremental dedup: corpus carries, duplicate generations are harmless") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bincdedup_")
    val outDir = s"$tmp/out"
    val fpTable = "graft_fp_store_spec"
    graft.sources.Sinks.dropManagedTable(spark, fpTable)
    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDS().toDF("doc_id", "text")
    val q = StreamingIngest.incrementalDedupSinkBucketed(
      stream, "doc_id", "text", fpTable, outDir, buckets = 4)
    try {
      input.addData((1L, "aa"), (2L, "bb"))
      q.processAllAvailable()
      // "bb" already in corpus; "cc" dups within batch -> keep id 3
      input.addData((10L, "bb"), (3L, "cc"), (4L, "cc"), (5L, "dd"))
      q.processAllAvailable()
      val out = spark.read.parquet(outDir)
        .select($"keep_id").collect().map(_.getLong(0)).sorted
      assert(out.toSeq === Seq(1L, 2L, 3L, 5L))
      // append-only store: distinct fingerprints = distinct contents seen
      assert(spark.table(fpTable).select($"fp").distinct().count() === 4)
      // a replayed generation (same batch_id re-appended) is an existence
      // no-op: the anti-join result for a later batch cannot change
      spark.table(fpTable).where($"batch_id" === 0L)
        .write.bucketBy(4, "fp").mode("append").saveAsTable(fpTable)
      input.addData((20L, "aa"), (6L, "ee")) // aa dies, ee is fresh
      q.processAllAvailable()
      val out2 = spark.read.parquet(outDir)
        .select($"keep_id").collect().map(_.getLong(0)).sorted
      assert(out2.toSeq === Seq(1L, 2L, 3L, 5L, 6L))
    } finally {
      q.stop()
      graft.sources.Sinks.dropManagedTable(spark, fpTable)
    }
  }

  test("heavyHitterSink: additive partials accumulate and replay clean") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_shh_spec_").toString
    val landing = s"$tmp/landing"; val counts = s"$tmp/counts"
    val schema = org.apache.spark.sql.types.StructType.fromDDL("t STRING")
    def drain(ckpt: String): Unit =
      StreamingIngest.heavyHitterSink(
        spark.readStream.schema(schema).parquet(landing), "t", counts,
        checkpointDir = Some(ckpt), availableNow = true).awaitTermination()
    Seq("a", "a", "b").toDF("t").write.mode("overwrite").parquet(landing)
    drain(s"$tmp/ckpt1")
    Seq("a", "c").toDF("t").write.mode("append").parquet(landing)
    drain(s"$tmp/ckpt1")
    def totals() = spark.read.parquet(counts)
      .groupBy("item").agg(sum("cnt").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals() === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    // batch-id-keyed overwrite: a re-run of a batch id REPLACES its
    // directory instead of appending rows next to the old generation.
    // Simulate by re-draining the same landing under a fresh checkpoint
    // (everything reprocesses as batch 0): the batch_id=0 slice must now
    // hold exactly the re-run's counts — no duplicate files surviving.
    val before = spark.read.parquet(counts)
      .where(col("batch_id") === 0L)
      .groupBy("item").agg(sum("cnt").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    drain(s"$tmp/ckpt2") // replays ALL landed data as a new batch 0
    val after = spark.read.parquet(counts)
      .where(col("batch_id") === 0L)
      .groupBy("item").agg(sum("cnt").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    assert(before === Map("a" -> 2L, "b" -> 1L))
  }
}
