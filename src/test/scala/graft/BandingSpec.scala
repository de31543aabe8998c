package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Banding

/** `Banding.ntileByStratum` must equal the single-window
  * `ntile(b) OVER (PARTITION BY stratum ORDER BY keys)` row-for-row —
  * including the n < buckets edge (each row its own band) and uneven
  * strata (first n mod b buckets one row larger).
  */
class BandingSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def windowed(df: org.apache.spark.sql.DataFrame, b: Int) = {
    val w = Window.partitionBy(col("st")).orderBy(col("v").asc, col("id").asc)
    df.withColumn("band", ntile(b).over(w).cast("long"))
  }

  test("two-level ntile equals the window formulation on uneven strata") {
    // strata of size 13, 7, 3 (n < buckets), 1 — forces both bucket-size
    // branches and the degenerate every-row-its-own-band case
    val rows = (1 to 13).map(i => ("a", i * 10L, i.toLong)) ++
      (1 to 7).map(i => ("b", 1000L - i, 100L + i)) ++
      (1 to 3).map(i => ("c", i.toLong, 200L + i)) ++
      Seq(("d", 5L, 300L))
    val df = rows.toDF("st", "v", "id").repartition(5)
    val b = 4
    val got = Banding.ntileByStratum(df, "st", Seq("v", "id"), b)
      .select("st", "id", "band").as[(String, Long, Long)]
      .collect().toSet
    val want = windowed(df, b)
      .select("st", "id", "band").as[(String, Long, Long)]
      .collect().toSet
    assert(got === want)
  }

  test("null stratum is its own partition, exactly like the window form") {
    // PARTITION BY groups nulls together; the offset join must be
    // null-safe or every null-stratum row silently disappears
    val rows: Seq[(String, Long, Long)] =
      Seq((null, 10L, 1L), (null, 5L, 2L), (null, 7L, 3L),
        ("a", 1L, 4L), ("a", 2L, 5L))
    val df = rows.toDF("st", "v", "id").repartition(3)
    val got = Banding.ntileByStratum(df, "st", Seq("v", "id"), 2)
      .select("id", "band").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = windowed(df, 2)
      .select("id", "band").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.size === 5) // nothing dropped
    assert(got === want)
  }

  test("high-cardinality stratum falls back to the window formulation") {
    // 2000 distinct strata > maxStrata=256: the guard must route to the
    // plain window path (right plan for many small strata) and still
    // equal the window truth exactly
    val df = spark.range(6000)
      .select(concat(lit("s"), pmod($"id", lit(2000L))).as("st"),
        pmod($"id" * 2654435761L, lit(9973L)).as("v"), $"id")
    val banded = Banding.ntileByStratum(df, "st", Seq("v", "id"), 3)
    val got = banded.select("st", "id", "band")
      .as[(String, Long, Long)].collect().toSet
    val want = windowed(df, 3).select("st", "id", "band")
      .as[(String, Long, Long)].collect().toSet
    assert(got === want)
    // and the plan really is the window one (ntile), not the two-level join
    val plan = banded.queryExecution.executedPlan.toString
    assert(plan.contains("ntile"), plan.take(1500))
  }

  test("internal/output name collisions are rejected up front") {
    val df = Seq(("a", 1L, 2L)).toDF("st", "v", "_pid")
    val e = intercept[IllegalArgumentException] {
      Banding.ntileByStratum(df, "st", Seq("v"), 2)
    }
    assert(e.getMessage.contains("_pid"))
    val df2 = Seq(("a", 1L, 2L)).toDF("st", "v", "band")
    val e2 = intercept[IllegalArgumentException] {
      Banding.ntileByStratum(df2, "st", Seq("v"), 2)
    }
    assert(e2.getMessage.contains("band"))
  }

  test("no storage leak: persisted intermediates released after the call") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val df = (1 to 50).map(i => (s"s${i % 2}", i.toLong, i.toLong))
      .toDF("st", "v", "id")
    Banding.ntileByStratum(df, "st", Seq("v", "id"), 4).collect()
    // the ranked intermediate must be unpersisted; only the result's own
    // (ContextCleaner-managed) checkpoint may remain
    val leaked = spark.sparkContext.getPersistentRDDs.size - before
    assert(leaked <= 1, s"leaked $leaked persistent RDDs")
  }

  test("two-level ntile matches across bucket counts and partitionings") {
    val df = (1 to 97).map(i => (s"s${i % 3}", (i * 37 % 101).toLong,
      i.toLong)).toDF("st", "v", "id")
    for (b <- Seq(1, 2, 5, 10); parts <- Seq(1, 7)) {
      val in = df.repartition(parts)
      val got = Banding.ntileByStratum(in, "st", Seq("v", "id"), b)
        .select("st", "id", "band").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = windowed(in, b)
        .select("st", "id", "band").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"buckets=$b parts=$parts")
    }
  }
}
