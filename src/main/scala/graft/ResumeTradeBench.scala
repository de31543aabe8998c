package graft

import org.apache.spark.sql.functions._

/** Measures ResumableWrite's read-amplification trade: an unfaulted
  * waves=N resumable pass vs a plain one-job dynamic-overwrite
  * partitioned write of the same data — the BASELINE.md "pass cost vs
  * plain write" row. Run over an amplified events table (reuses the
  * ScaleSmoke pinned dir when SPARK_GRAFT_SCALE_DIR points at one):
  *
  *   SPARK_GRAFT_SCALE_DIR=… sbt "runMain graft.ResumeTradeBench [dir] [waves]"
  */
object ResumeTradeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SCALE_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val waves = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // amplify in-memory (no table build needed): factor re-dated copies,
    // each shifted a year of days apart so the bucket count grows too
    val factor = args.lift(2).map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_TRADE_FACTOR").map(_.toInt))
      .getOrElse(10)
    val base = Tables.events(spark, dir).select(col("ts"), col("value"))
    val data = (0 until factor).map { r =>
      base.withColumn("ts",
        col("ts") + expr(s"INTERVAL ${r * 366} DAYS"))
    }.reduce(_ unionByName _)
    val bucket = graft.operators.TimePartitioning.bucket(
      col("ts"), graft.operators.TimePartitioning.Day)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def freshDir() =
      java.nio.file.Files.createTempDirectory(Queries.tempBase,
        "graft_trade_").toString
    data.count() // warm the reader
    val plainDir = freshDir()
    val plain = timed {
      data.withColumn("bucket", bucket)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(plainDir)
    }
    val resumeDir = freshDir()
    val resumable = timed {
      graft.pipeline.ResumableWrite.run(spark, data, bucket, resumeDir,
        waves = waves, pass = 1)
      ()
    }
    // the recovery path itself: a pass that dies mid-write after
    // waves/2 commits, then a resume pass that must skip the committed
    // waves and write only the lost ones — faulted + resume should sum
    // to ≈ the unfaulted pass (the skip check is a marker listing, and
    // each wave's input scan is paid by whichever pass writes it)
    val faultDir = freshDir()
    val faulted = timed {
      try {
        graft.pipeline.ResumableWrite.run(spark, data, bucket, faultDir,
          waves = waves, pass = 1, failAfterWaves = Some(waves / 2))
        ()
      } catch { case _: graft.pipeline.ResumableWrite.InjectedFault => () }
    }
    val resumed = timed {
      graft.pipeline.ResumableWrite.run(spark, data, bucket, faultDir,
        waves = waves, pass = 2)
      ()
    }
    println(s"""{"metric":"resume_trade","plain_write_sec":${Bench.jnum(plain, 2)},""" +
      s""""resumable_pass_sec":${Bench.jnum(resumable, 2)},"waves":$waves,""" +
      s""""ratio":${Bench.jnum(resumable / plain, 2)},""" +
      s""""faulted_pass_sec":${Bench.jnum(faulted, 2)},"resume_pass_sec":${Bench.jnum(resumed, 2)},""" +
      s""""recovery_total_ratio":${Bench.jnum((faulted + resumed) / plain, 2)},""" +
      s""""dir":"$dir"}""")
    Queries.rmTree(new java.io.File(plainDir))
    Queries.rmTree(new java.io.File(resumeDir))
    Queries.rmTree(new java.io.File(faultDir))
    spark.stop()
  }
}
