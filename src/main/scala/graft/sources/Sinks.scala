package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Output sinks — the reference's output-plugin stage (reducer-side output
  * in `EmbulkPartitioningMapReduce.java:186`, task-side in
  * `EmbulkMapReduce.java`). Each format is a Spark DataSource writer; graft
  * standardizes partitioned layout and file sizing.
  */
object Sinks {

  /** Write with optional bucket-directory partitioning — the partitioned
    * load's output contract (one directory per key).
    */
  def write(df: DataFrame, path: String, format: String = "parquet",
      bucket: Option[Column] = None, reducers: Option[Int] = None,
      maxRecordsPerFile: Long = 5000000L,
      options: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.functions.col
    val (frame, partCols) = bucket match {
      case Some(b) =>
        val withB = df.withColumn("bucket", b)
        val shuffled = reducers match {
          case Some(n) => withB.repartition(n, col("bucket"))
          case None => withB.repartition(col("bucket"))
        }
        (shuffled, Seq("bucket"))
      case None => (df, Nil)
    }
    val w = frame.write.format(format)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .options(options)
      .mode("overwrite")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).save(path)
  }

  def parquet(df: DataFrame, path: String, bucket: Option[Column] = None): Unit =
    write(df, path, "parquet", bucket)

  def csv(df: DataFrame, path: String, header: Boolean = true): Unit =
    write(df, path, "csv", options = Map("header" -> header.toString))

  def jsonl(df: DataFrame, path: String): Unit =
    write(df, path, "json")
}
