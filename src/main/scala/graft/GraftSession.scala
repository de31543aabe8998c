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
      // spill-aware partition sizing: shuffles START above the core count
      // and AQE coalesces back down from runtime statistics, so reducer
      // counts scale with input instead of pinning at `cores`. The
      // ceiling is 2× cores, not the folklore 8×: a measured 300×-decade
      // A/B (BASELINE.md r15) showed 8× REGRESSING the CPU-bound object
      // aggregates 1.4-2× (extra task waves pay per-task constants; the
      // big sorts there weren't spilling in the first place) while 2×
      // halved q5-class SMJ sorts and stabilized the basket-assembly
      // aggregate. On a real cluster, scale the ceiling with
      // total-executor-cores via SPARK_GRAFT_INIT_PARTITIONS — the
      // trade is per-task constant overhead vs per-task sort footprint,
      // and the right ceiling grows with the data-to-memory ratio.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS",
          (cores * 2).toString))
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
