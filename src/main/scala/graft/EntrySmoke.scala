package graft

import org.apache.spark.sql.SparkSession

/** Smoke: simulate the driver calling `SparkEntry.entry` with a *vanilla*
  * session (none of graft's reader confs) — entry must still work.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_SMOKE rows=$n schema=${df.schema.simpleString}")
    spark.stop()
  }
}
