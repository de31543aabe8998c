package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-family scale evidence: wall-time growth AND the state
  * backend's own accounting at 30×/100×, for the three streaming
  * families whose "watermark-bounded state" claims were previously
  * asserted but never measured (E7 `streaming_hourly_counts`, E8
  * `streaming_sessionize`, L12 `dedup_incremental_stream`).
  *
  * What "state" means per family — and why each stays bounded while
  * input grows (the claim this bench turns into recorded numbers):
  *  - windowed agg: StateStore rows = live (window × event_type)
  *    combinations — time-range × type cardinality, NOT input rows;
  *  - flatMapGroupsWithState sessionize: StateStore rows = open
  *    sessions = active user keys, NOT events;
  *  - foreachBatch incremental dedup: state is the on-disk fingerprint
  *    table — 16-byte hashes per DISTINCT document, NOT bytes of text.
  *
  * StateStore numbers come from `StreamingQueryProgress.stateOperators`
  * (numRowsTotal / memoryUsedBytes / numRowsDroppedByWatermark) via a
  * session-level listener, so the registered query paths run UNCHANGED —
  * the bench observes the same drains Verify gates. The dedup family's
  * fingerprint state is measured directly (rows + bytes on disk) from a
  * pinned fpDir running the exact `incrementalDedupSink` the registered
  * query wraps.
  *
  * Run (dir is a `ScaleSmoke`-amplified pinned dir):
  *   sbt "runMain graft.StreamScaleBench /tmp/graft_scale30"
  */
object StreamScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SCALE_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // max-over-progress StateStore accounting for the CURRENT family run;
    // the listener sees every microbatch of every drain the family performs
    val maxRows = new AtomicLong(0L)
    val maxMem = new AtomicLong(0L)
    val dropped = new AtomicLong(0L)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        e.progress.stateOperators.foreach { s =>
          maxRows.getAndUpdate(m => math.max(m, s.numRowsTotal))
          maxMem.getAndUpdate(m => math.max(m, s.memoryUsedBytes))
          dropped.addAndGet(s.numRowsDroppedByWatermark)
          ()
        }
    })

    def run(name: String)(body: => Map[String, Long]): Unit = {
      maxRows.set(0); maxMem.set(0); dropped.set(0)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val extra = body
      val sec = (System.nanoTime() - t0) / 1e9
      // progress events ride an async listener bus; the drains themselves
      // are awaitTermination'd inside `body`, so a short grace period is
      // only covering event delivery, not query execution
      Thread.sleep(2000)
      val extraJson = extra.map { case (k, v) => s""","$k":$v""" }.mkString
      println(s"""{"query":"$name","dir":"$dir","sec":${Bench.jnum(sec, 2)},""" +
        s""""state_rows_max":${maxRows.get},""" +
        s""""state_mem_bytes_max":${maxMem.get},""" +
        s""""rows_dropped_by_watermark":${dropped.get}$extraJson}""")
    }

    def diskBytes(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    }

    spark.range(1000000L).selectExpr("sum(id)").collect() // warm

    // E7: windowed agg — the registered query path verbatim
    run("streaming_hourly_counts") {
      Queries.streamingHourlyCounts(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Map.empty
    }

    // E8: flatMapGroupsWithState — the registered query path verbatim
    run("streaming_sessionize") {
      Queries.streamingSessionize(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Map.empty
    }

    // E7c: built-in session_window aggregation — the registered query
    // path verbatim, now the APPEND-mode two-drain form: state is OPEN
    // sessions only (closed sessions emit once and evict on the
    // watermark), and the late-replay drain's rows must show up in
    // rows_dropped_by_watermark
    run("streaming_session_window") {
      Queries.streamingSessionWindow(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Map.empty
    }

    // E8f: dropDuplicatesWithinWatermark — state rows must track DISTINCT
    // KEYS inside the watermark horizon, not input rows (the doubled
    // landing feeds 2× rows through 1× keys)
    run("dedup_within_watermark") {
      Queries.dedupWithinWatermarkQ(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Map.empty
    }

    // L12: foreachBatch incremental dedup — the registered query's exact
    // logic (Queries.dedupIncrementalStream) with a pinned fpDir so the
    // fingerprint table — this family's state — can be measured on disk
    run("dedup_incremental_stream") {
      val tmp =
        java.nio.file.Files.createTempDirectory("graft_sscale_").toString
      val landing = s"$tmp/landing"; val fpDir = s"$tmp/fps"
      val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val d = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      d.where(pmod(col("doc_id"), lit(2)) === 0)
        .write.mode("overwrite").parquet(landing)
      def drain(): Unit =
        graft.streaming.StreamingIngest.incrementalDedupSink(
          spark.readStream.schema(d.schema).parquet(landing),
          "doc_id", "text", fpDir, outDir,
          checkpointDir = Some(ckpt), availableNow = true)
          .awaitTermination()
      drain()
      d.where(pmod(col("doc_id"), lit(2)) === 1)
        .write.mode("append").parquet(landing)
      drain()
      val emitted = spark.read.parquet(outDir).count()
      Map(
        "fp_state_rows" -> spark.read.parquet(fpDir).count(),
        "fp_state_bytes" -> diskBytes(fpDir),
        "input_rows" -> d.count(),
        "input_bytes" -> diskBytes(s"$dir/documents.parquet"),
        "emitted_rows" -> emitted)
    }

    spark.stop()
  }
}
