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

  test("physical plan: exchange+sort sit between partial prune and final") {
    val ev = Tables.events(spark, sf).select($"user_id", $"event_id", $"value")
    val df = TopKPerKey.topK(ev, Seq("user_id"),
      Seq("value" -> "desc", "event_id" -> "asc"), k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), plan.take(1500))
    assert(plan.contains("Exchange hashpartitioning"), plan.take(1500))
    // the point: the only Sort is the final's spill-safe external sort over
    // PARTIAL-PRUNED rows (≤ k × map partitions per key) — it must sit
    // between the final (above) and the exchange+partial (below), never
    // under the partial where it would sort the corpus
    val iSort = plan.indexOf("Sort [")
    val iFinal = plan.indexOf("TopKPerKey [")
    val iEx = plan.indexOf("Exchange hashpartitioning")
    val iPart = plan.indexOf("TopKPerKeyPartial")
    assert(iSort >= 0 && iFinal >= 0 && iFinal < iSort && iSort < iEx &&
      iEx < iPart, s"want final<sort<exchange<partial, got " +
      s"$iFinal/$iSort/$iEx/$iPart\n" + plan.take(2000))
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

  test("forced tiny buffer budget on a high-cardinality key equals window truth") {
    // 20k rows over 5k distinct keys with a 64-row partial buffer: the
    // buffer map flushes hundreds of times per partition, so the partial
    // emits many chunks per key — the final's sorted streaming pass must
    // still produce exactly the window-formulation top-k
    spark.conf.set(graft.plans.TopKPerKeyExec.PartialBufferRowsKey, "64")
    try {
      val df = spark.range(20000)
        .select(pmod($"id", lit(5000L)).as("g"), $"id",
          pmod($"id" * 2654435761L, lit(1000003L)).as("v"))
        .repartition(8)
      val out = TopKPerKey.topK(df, Seq("g"),
          Seq("v" -> "asc", "id" -> "asc"), k = 2)
        .select($"g", $"id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
        .orderBy($"v".asc, $"id".asc)
      val truth = df.withColumn("rn", row_number().over(w))
        .where($"rn" <= 2).select($"g", $"id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out === truth)
      assert(out.size === 10000) // 5k groups × k=2 (each group holds 4 rows)
    } finally spark.conf.unset(graft.plans.TopKPerKeyExec.PartialBufferRowsKey)
  }

  test("seeded-random sweep: topK equals window truth across k and budgets") {
    // randomized-but-reproducible stress over the rewritten operator:
    // skewed key distribution (some hot keys), duplicate order values
    // (ties broken by id — total order), varying k and partial budgets
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      val key = if (rnd.nextInt(4) == 0) 0L else rnd.nextInt(200).toLong
      (key, rnd.nextInt(50).toLong, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(7)
    for (k <- Seq(1, 3, 17); budget <- Seq(32, 1 << 20)) {
      spark.conf.set(graft.plans.TopKPerKeyExec.PartialBufferRowsKey,
        budget.toString)
      try {
        val got = TopKPerKey.topK(df, Seq("g"),
            Seq("v" -> "asc", "id" -> "asc"), k)
          .select($"g", $"id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
          .orderBy($"v".asc, $"id".asc)
        val want = df.withColumn("rn", row_number().over(w))
          .where($"rn" <= k).select($"g", $"id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === want, s"k=$k budget=$budget")
      } finally spark.conf.unset(
        graft.plans.TopKPerKeyExec.PartialBufferRowsKey)
    }
  }

  test("non-positive k is rejected up front") {
    val df = Seq((1L, 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      TopKPerKey.topK(df, Seq("g"), Seq("v" -> "asc"), k = 0)
    }
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
