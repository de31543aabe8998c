package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed tables: pre-shuffled storage so repeated fact-fact joins on the
  * bucket key plan WITHOUT an exchange — the storage-level answer to the
  * reference's fixed reducer partitioning, and SURVEY §5's co-located join
  * rule. (At 100 TB this turns every recurring join/agg on the bucket key
  * from a full shuffle into a local merge.)
  */
class BucketingSpec extends AnyFunSuite with SparkFixture {

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    // the in-memory catalog is fresh per JVM but spark-warehouse dirs
    // persist on disk — clear both layers
    Seq("li_b", "ord_b")
      .foreach(graft.sources.Sinks.dropManagedTable(spark, _))
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // disable broadcast so the co-located (bucket-aligned) join shape is
    // what gets planned — at real scale neither side broadcasts anyway
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")).as("t"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan.take(1500))
    // the point of bucketing: no shuffle before the join OR the aggregation
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2500))
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }

  test("bucketed snapshot diff: the full-outer reconciliation join plans no exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Queries.snapshotDiffBucketed(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2500))
      // same answer as the ad-hoc diff
      val adhoc = Queries.snapshotDiff(spark, sf).collect()(0)
      val bucketed = df.collect()(0)
      assert(adhoc === bucketed)
    } finally spark.conf
      .set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
