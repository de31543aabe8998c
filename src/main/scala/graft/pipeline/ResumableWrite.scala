package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-job partial-done recovery — the Spark-native analogue of the
  * reference's `retry_tasks` resume (`AttemptState.java:1-170` persists
  * per-attempt start/finish state; `MapReduceExecutor.java:139-190` reads
  * it back so a restarted job re-runs ONLY unfinished tasks).
  *
  * Spark's file committer is all-or-nothing per JOB — a partitioned write
  * that dies at 95% leaves nothing visible, and the re-run pays the full
  * 100 TB again. Bucket-level resume therefore needs commit granularity
  * below "the whole write" without collapsing to a per-bucket driver loop:
  *
  *  - buckets are assigned to a fixed number of WAVES (`bucket mod waves`
  *    — deterministic and SQL-replayable, so an oracle can recompute which
  *    pass wrote which bucket);
  *  - each wave is ONE filtered, full-parallelism partitioned-write job in
  *    dynamic-partition-overwrite mode (re-running a wave replaces its
  *    leaves idempotently — the crash window between data commit and
  *    manifest append costs a rewrite, never duplicates);
  *  - after a wave's job commits, a manifest row per bucket directory
  *    `(bucket, n_rows, pass, wave)` is appended next to the data. The
  *    manifest IS the attempt state: a resume pass lists completed waves
  *    from it and runs only the rest.
  *
  * Driver-side state is one row per leaf directory — what a metastore
  * partition listing holds anyway — aggregated to a `waves`-sized set, so
  * the resume decision is O(waves), not O(rows). At 1000 executors each
  * wave is still an embarrassingly parallel write; `waves` trades recovery
  * granularity (work lost on failure ≤ one wave) against per-job overhead.
  */
object ResumableWrite {

  /** Deterministic injected failure for the resume demo/spec — thrown
    * between waves, after `afterWaves` have committed.
    */
  final case class InjectedFault(afterWaves: Int) extends RuntimeException(
    s"graft: injected fault after $afterWaves committed waves")

  private def manifestDir(outDir: String) = s"$outDir/_graft_manifest"

  /** Waves whose manifest rows are already durable (empty set when no
    * manifest exists yet). O(waves) collect of an aggregate — never
    * per-bucket data to the driver.
    */
  def completedWaves(spark: SparkSession, outDir: String): Set[Int] = {
    val dir = new java.io.File(manifestDir(outDir))
    if (!dir.exists()) Set.empty
    else spark.read.parquet(manifestDir(outDir))
      .select(col("wave")).distinct().collect()
      .map(_.getInt(0)).toSet
  }

  /** Run (or resume) the partitioned write of `df` bucketed by `bucket`
    * into `outDir`. Returns the number of waves actually written this
    * pass — a completed layout resumes to 0, the skip proof.
    *
    * `failAfterWaves = Some(n)` injects a deterministic [[InjectedFault]]
    * once `n` waves have committed IN THIS PASS (the demo of the
    * mid-write crash; production passes leave it None).
    */
  def run(spark: SparkSession, df: DataFrame, bucket: Column,
      outDir: String, waves: Int, pass: Int,
      failAfterWaves: Option[Int] = None): Int = {
    require(waves > 0, s"waves must be positive: $waves")
    val done = completedWaves(spark, outDir)
    var wrote = 0
    for (w <- 0 until waves if !done.contains(w)) {
      failAfterWaves.foreach { n =>
        if (wrote >= n) throw InjectedFault(n)
      }
      val slice = df.withColumn("bucket", bucket)
        .where(pmod(col("bucket"), lit(waves)) === lit(w))
      // dynamic overwrite: only THIS wave's leaf dirs are replaced, so a
      // wave re-run after a commit/manifest crash is idempotent and other
      // waves' durable output is untouched
      slice.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(outDir)
      slice.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("pass", lit(pass))
        .withColumn("wave", lit(w))
        .write.mode("append").parquet(manifestDir(outDir))
      wrote += 1
    }
    wrote
  }

  /** The manifest as a DataFrame: `(bucket, n_rows, pass, wave)` — one row
    * per leaf directory per writing pass.
    */
  def manifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(manifestDir(outDir))

  /** The written layout read back (partition column `bucket` included). */
  def readBack(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
