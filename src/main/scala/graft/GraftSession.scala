package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale defaults.
  *
  * Replaces the reference's Hadoop `Job` configuration surface
  * (`MapReduceExecutor.java:139-190` sets up the job; here Catalyst + AQE own
  * physical planning). AQE is on so reducer counts / skew handling are decided
  * at runtime from shuffle statistics — the Spark-native answer to the
  * reference's static `reducers` knob (`MapReduceExecutorTask.java:44`).
  */
object GraftSession {
  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // spill-aware partition sizing: shuffles START at 8× the core count
      // and AQE coalesces back down from runtime statistics, so reducer
      // counts SCALE WITH INPUT instead of pinning at `cores`. At the
      // 300× decade the fixed-32 layout gave single sorts 10M+ rows per
      // task — past the per-task execution-memory share, so external
      // sorts spilled super-linearly (q5/triangle/span_dedup class);
      // with an 8× ceiling the same sorts stay in-memory while small
      // inputs still coalesce to a handful of partitions. On a cluster
      // this is exactly the executors×cores headroom a static
      // shuffle.partitions would have to guess per-query.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cores * 8).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // graft uses wrap-around 64-bit affine hashes (MinHash permutations);
      // ANSI overflow checking would reject that arithmetic.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
