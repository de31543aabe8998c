package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Output sinks — the reference's output-plugin stage (reducer-side output
  * in `EmbulkPartitioningMapReduce.java:186`, task-side in
  * `EmbulkMapReduce.java`). Each format is a Spark DataSource writer; graft
  * standardizes partitioned layout and file sizing.
  */
object Sinks {

  /** Write with optional bucket-directory partitioning — the partitioned
    * load's output contract (one directory per key). `splitHotBuckets` > 1
    * is the reference's `map_side_partition_split` skew mitigation
    * (`TimestampPartitioning.java:273-289`, `key=(bucket<<16)|rr`): the
    * shuffle key becomes (bucket, salt) so one hot bucket's rows spread
    * over that many reducer tasks, while `partitionBy` still lands every
    * row in its bucket directory — the salt only widens task parallelism,
    * never the layout. The salt is a deterministic row hash (stable under
    * Spark task retries, unlike the reference's round-robin counter).
    */
  def write(df: DataFrame, path: String, format: String = "parquet",
      bucket: Option[Column] = None, reducers: Option[Int] = None,
      maxRecordsPerFile: Long = 5000000L,
      options: Map[String, String] = Map.empty,
      splitHotBuckets: Int = 1): Unit = {
    import org.apache.spark.sql.functions.{col, struct}
    val (frame, partCols) = bucket match {
      case Some(b) =>
        val withB = df.withColumn("bucket", b)
        val shuffleKeys =
          if (splitHotBuckets > 1)
            Seq(col("bucket"), graft.operators.TimePartitioning.salt(
              struct(df.columns.map(col): _*), splitHotBuckets))
          else Seq(col("bucket"))
        val shuffled = reducers match {
          case Some(n) => withB.repartition(n, shuffleKeys: _*)
          case None => withB.repartition(shuffleKeys: _*)
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
