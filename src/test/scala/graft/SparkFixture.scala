package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object SparkFixture {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf: String = "/root/testdata/sf0.001"
}

trait SparkFixture {
  // val (stable identifier) so tests can `import spark.implicits._`
  val spark: SparkSession = SparkFixture.spark
  val sf: String = SparkFixture.sf
}
