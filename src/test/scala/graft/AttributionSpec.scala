package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SpanDedup

/** Specs for the E45b/L38 batch: exact-cents multi-touch attribution and
  * n-gram novelty scoring.
  */
class AttributionSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("position attribution conserves every cent of purchase value") {
    val out = Queries.attributionPosition(spark, sf)
    val credited = out.agg(sum(col("credited_value")))
      .collect()(0).getDouble(0)
    val total = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .agg((sum(col("value").cast("decimal(18,2)") * 100).cast("long")
        .cast("double") / lit(100.0)).as("t"))
      .collect()(0).getDouble(0)
    // double-rounded comparison: both sides are exact cents / 100
    assert(math.abs(credited - total) < 1e-6,
      s"credited=$credited total=$total")
  }

  test("U-shaped weights: ends carry 40% each, middles share 20%") {
    // one purchase of 10.00 with 4 touches: expect 400/100/100/400 cents
    val ev = Seq(
      (1L, "view", 1000L, 10L), (2L, "view", 2000L, 10L),
      (3L, "view", 3000L, 10L), (4L, "view", 4000L, 10L))
      .toDF("event_id", "event_type", "t_us", "user_id")
    // reuse the registered query's internals via a tiny staged dir
    val tmp = java.nio.file.Files.createTempDirectory("graft_attr_")
    val events = ev.select(col("event_id"), col("event_type"),
        timestamp_micros(col("t_us")).as("ts"), col("user_id"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .unionByName(Seq((9L, "purchase", 5000L, 10L))
        .toDF("event_id", "event_type", "t_us", "user_id")
        .select(col("event_id"), col("event_type"),
          timestamp_micros(col("t_us")).as("ts"), col("user_id"),
          lit(10.0).as("value"), lit("{}").as("props")))
    events.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // the other tables aren't touched by this query; only events loads
    val out = Queries.attributionPosition(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // all four touches land in hour 0; total credit = the full 10.00
    assert(math.abs(out(0L) - 10.0) < 1e-9)
    assert(!out.contains(-1L))
  }

  test("purchases without an in-window touch credit hour -1 in full") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_attr2_")
    Seq((9L, "purchase", 5000L, 10L, 7.5))
      .toDF("event_id", "event_type", "t_us", "user_id", "value")
      .select(col("event_id"), col("event_type"),
        timestamp_micros(col("t_us")).as("ts"), col("user_id"),
        col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Queries.attributionPosition(spark, tmp.toString).collect()
    assert(out.length == 1 && out(0).getLong(0) == -1L
      && math.abs(out(0).getDouble(2) - 7.5) < 1e-9)
  }

  test("novelty: a verbatim repeat of an earlier doc scores 0, the first 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val out = SpanDedup.noveltyStats(docs, col("doc_id"), col("text"), n = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0 && out(2L) == 0.0 && out(3L) == 1.0)
  }

  test("novelty: short docs report 1.0 with zero windows") {
    val docs = Seq((1L, "just a few words")).toDF("doc_id", "text")
    val r = SpanDedup.noveltyStats(docs, col("doc_id"), col("text"), n = 8)
      .collect()(0)
    assert(r.getLong(1) == 0L && r.getDouble(3) == 1.0)
  }
}
