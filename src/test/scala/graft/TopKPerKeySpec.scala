package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.TopKPerKey

class TopKPerKeySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("custom TopKPerKeyExec equals the window row_number formulation") {
    val ev = Tables.events(spark, sf).select($"user_id", $"event_id", $"value")
    val custom = TopKPerKey.topK(ev,
        keys = Seq("user_id"),
        order = Seq("value" -> "desc", "event_id" -> "asc"), k = 3)
      .select($"user_id", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val window = Queries.windowTopEvents(spark, sf)
      .select($"user_id", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom === window)
    assert(custom.nonEmpty)
  }

  test("physical plan uses TopKPerKeyExec behind a key exchange, no sort") {
    val ev = Tables.events(spark, sf).select($"user_id", $"event_id", $"value")
    val df = TopKPerKey.topK(ev, Seq("user_id"),
      Seq("value" -> "desc", "event_id" -> "asc"), k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), plan.take(1500))
    assert(plan.contains("Exchange hashpartitioning"), plan.take(1500))
    // the whole point: no per-key full sort
    assert(!plan.contains("Sort ["), plan.take(1500))
  }

  test("partial pass prunes before the exchange and preserves the result") {
    // 40k rows, ONE key: without the map-side partial, the exchange moves
    // all 40k rows to a single reducer; with it, each map partition ships
    // at most k rows. Result must equal the unpruned top-k exactly.
    val df = spark.range(40000)
      .select(lit(1L).as("g"), $"id",
        (pmod($"id" * 2654435761L, lit(1000003L))).as("v"))
      .repartition(8)
    val out = TopKPerKey.topK(df, Seq("g"), Seq("v" -> "asc", "id" -> "asc"),
      k = 5)
    val rows = out.select($"id").collect().map(_.getLong(0)).toSet
    val truth = df.orderBy($"v".asc, $"id".asc).limit(5)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(rows === truth)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan.take(2000))
    // partial sits BELOW the exchange, final above it
    val ip = plan.indexOf("TopKPerKeyPartial")
    val ie = plan.indexOf("Exchange hashpartitioning")
    val if_ = plan.indexOf("TopKPerKey [")
    assert(if_ >= 0 && ie > if_ && ip > ie,
      s"want final<exchange<partial in tree order, got $if_/$ie/$ip\n" +
        plan.take(2000))
  }

  test("ties and k larger than group size behave like the window version") {
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 5.0), (1L, 3L, 4.0), (2L, 4L, 1.0))
      .toDF("user_id", "event_id", "value")
    val out = TopKPerKey.topK(df, Seq("user_id"),
        Seq("value" -> "desc", "event_id" -> "asc"), k = 3)
      .select($"user_id", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L)))
  }
}
