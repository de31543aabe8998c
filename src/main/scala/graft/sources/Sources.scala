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

  /** Schema-evolution read: parquet drops whose schemas drifted (columns
    * added over time) union into one frame — `mergeSchema` reconciles the
    * footers (by-name, missing columns null), the operational norm for a
    * landing directory whose producer gained fields. Costs a footer scan
    * per file at planning (why it's off by default in Spark); pass the
    * explicit merged schema instead where planning time matters at 100 TB
    * (schema-on-read with no footer sweep).
    */
  def parquetEvolving(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

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
