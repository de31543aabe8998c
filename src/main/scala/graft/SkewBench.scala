package graft

import org.apache.spark.sql.functions._

/** Skew demonstration: one user owns half of all events (the "hot key" every
  * 100 TB pipeline meets). Compares the window row_number formulation —
  * which must sort the entire hot group — against the custom TopKPerKeyExec
  * bounded heap, and the salted vs unsalted bucket aggregation.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    // skew the provided events: map half of all rows onto user 0, and
    // amplify 20x so the hot group is ~1M rows
    val out = java.nio.file.Files.createTempDirectory("graft_skew_").toString
    val ev = Tables.events(spark, base)
    (0 until 20).map(r => ev
        .withColumn("event_id", col("event_id") + lit(r * 10000000L))
        .withColumn("user_id",
          when(pmod(col("event_id"), lit(2)) === 0, lit(0L))
            .otherwise(col("user_id") + lit(r * 1000000L))))
      .reduce(_ unionByName _)
      // payload: incompressible bytes so the hot SHUFFLE partition's
      // (compressed) size reflects real row weight, like document text
      .select(col("user_id"), col("event_id"), col("value"),
        md5(col("event_id").cast("string")).as("payload"))
      .write.mode("overwrite").parquet(out)
    val skewed = spark.read.parquet(out)
    println(s"rows=${skewed.count()}, hot=${skewed.where(col("user_id") === 0).count()}")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"SKEW $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.range(100000L).selectExpr("sum(id)").collect()

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    time("window_rn") {
      skewed.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .write.format("noop").mode("overwrite").save()
    }
    time("topk_exec") {
      graft.plans.TopKPerKey.topK(skewed, Seq("user_id"),
          Seq("value" -> "desc", "event_id" -> "asc"), k = 3)
        .write.format("noop").mode("overwrite").save()
    }

    // fact-fact join with the hot key: AQE skew-join must split the hot
    // partition (plan shows skew=true); vs. the same join with skew
    // handling off, where one task owns the entire hot key's output.
    // Production defaults detect skew at 256 MB partitions; scale the
    // thresholds to the sandbox's MB-sized hot key so the same rule fires
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    val dim = spark.range(1000000L)
      .select(col("id").as("user_id"), (col("id") % 97).as("seg"))
    def skewJoin() = skewed.join(dim, "user_id")
      .agg(sum(length(col("payload"))))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    var plain: Long = 0
    time("join_noskew") { plain = skewJoin().collect().head.getLong(0) }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    time("join_aqeskew") {
      val j = skewJoin()
      val v = j.collect().head.getLong(0)
      assert(v == plain, s"skew split changed the result: $v != $plain")
      val split = j.queryExecution.executedPlan.toString.contains("skew=true")
      println(s"SKEW join plan skew=true: $split")
    }
    spark.stop()
  }
}
