package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Input sources (reference: the executor delegates to Embulk input plugins
  * split-planned by `EmbulkInputFormat.java:37` / `EmbulkInputSplit.java:61`
  * and pulled by `EmbulkRecordReader.java:63`).
  *
  * Spark-first: each format is a DataSource with its own split planning;
  * graft only standardizes schema handling and the invalid-record mode
  * mapping (PERMISSIVE/DROPMALFORMED/FAILFAST ≈ ErrorPolicy for semi-
  * structured inputs).
  */
object Sources {
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  def jsonl(spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Split-size knob: the analogue of tuning input task counts. */
  def withMaxSplitBytes(spark: SparkSession, bytes: Long): SparkSession = {
    spark.conf.set("spark.sql.files.maxPartitionBytes", bytes.toString)
    spark
  }
}
