package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Hierarchy, Reconcile, Sketches, Stats}

/** Specs for the E37-E42 batch: Misra-Gries heavy hitters (sketch
  * guarantees + exact output), anti-entropy table checksums,
  * decimal-exact OLS, and pointer-doubling hierarchy flattening.
  */
class SketchesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // ----------------------------------------------- Misra-Gries summary ----

  test("misraGries keeps every item above the n/k undercount bound") {
    // Zipf-ish stream: item i appears 1000/i times, i = 1..50
    val stream = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    val n = stream.size
    val k = 20
    val mg = Sketches.misraGries(stream.iterator, k)
    assert(mg.size <= k - 1)
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong)
    // recall: every item with true freq > n/k must be present
    trueCounts.foreach { case (w, f) =>
      if (f > n.toLong / k) assert(mg.contains(w), s"$w freq=$f missing")
    }
    // undercount bound: estimate in [f - n/k, f]
    mg.foreach { case (w, est) =>
      val f = trueCounts(w)
      assert(est <= f && est >= f - n.toLong / k)
    }
  }

  test("mergeSummaries preserves the size bound and merged undercount") {
    val s1 = (1 to 30).flatMap(i => Seq.fill(300 / i)(s"a$i"))
    val s2 = (1 to 30).flatMap(i => Seq.fill(500 / i)(s"a$i")) ++
      Seq.fill(200)("a1")
    val k = 10
    val merged = Sketches.mergeSummaries(
      Sketches.misraGries(s1.iterator, k),
      Sketches.misraGries(s2.iterator, k), k)
    assert(merged.size <= k - 1)
    val all = s1 ++ s2
    val n = all.size
    val trueCounts = all.groupBy(identity).view.mapValues(_.size.toLong)
    trueCounts.foreach { case (w, f) =>
      if (f > n.toLong / k) assert(merged.contains(w), s"$w freq=$f missing")
    }
    merged.foreach { case (w, est) => assert(est <= trueCounts(w)) }
  }

  test("heavyHitters output is EXACT regardless of partitioning") {
    val rows = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"t$i"))
    val expected = {
      val n = rows.size.toLong
      rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * 12L > n }.toMap
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("item").repartition(parts)
      val got = Sketches.heavyHitters(df, col("item"), 12)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected, s"parts=$parts")
    }
  }

  test("heavyHitters rejects k < 2") {
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(Seq("a").toDF("item"), col("item"), 1)
    }
  }

  // --------------------------------------------------- table checksum -----

  test("tableChecksum is partitioning-invariant and flags any row change") {
    val base = (1L to 500L).map(i => (i, s"v$i")).toDF("id", "v")
    def sig(df: org.apache.spark.sql.DataFrame) =
      Reconcile.tableChecksum(df, pmod(col("id"), lit(8L)),
          concat_ws("|", col("id"), col("v")))
        .orderBy("bucket").collect().map(_.toSeq).toSeq
    val a = sig(base.repartition(1))
    assert(a === sig(base.repartition(13)))
    // a single modified row flips exactly its bucket's signature
    val tweaked = base.withColumn("v",
      when(col("id") === 42L, lit("CHANGED")).otherwise(col("v")))
    val b = sig(tweaked)
    val diff = a.zip(b).filter { case (x, y) => x != y }
    assert(diff.size === 1 && diff.head._1.head === (42L % 8L))
    // row counts unchanged in the differing bucket (only sigs move)
    assert(diff.head._1(1) === diff.head._2(1))
  }

  test("tableChecksum catches a duplicated-row-pair swap via count+sum") {
    // duplicate row 7 and drop row 15 (same bucket 8k+7): XOR alone
    // cancels the pair (x xor x = 0 keeps parity shifts visible but a
    // dup+drop of two distinct rows changes sum/count even when the
    // xor of the two digests happens to collide in some bits)
    val base = (1L to 64L).map(i => (i, "x")).toDF("id", "v")
    val mutated = base.where(col("id") =!= 15L)
      .union(base.where(col("id") === 7L))
    def sig(df: org.apache.spark.sql.DataFrame) =
      Reconcile.tableChecksum(df, pmod(col("id"), lit(8L)),
          concat_ws("|", col("id"), col("v")))
        .orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(sig(base) !== sig(mutated))
  }

  // ------------------------------------------------------- olsExact -------

  test("olsExact recovers an exact linear relationship") {
    // y = 3x + 5 exactly -> slope 3, intercept 5, r2 = 1
    val df = (0 to 20).map(x => ("g", x, 3.0 * x + 5.0)).toDF("g", "x", "y")
    val r = Stats.olsExact(df, col("g"), col("x"), col("y")).collect().head
    assert(r.getAs[Double]("slope") === 3.0)
    assert(r.getAs[Double]("intercept") === 5.0)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-12)
  }

  test("olsExact is bit-identical across partitionings") {
    val df = (1 to 5000).map(i =>
      (s"g${i % 3}", i % 24, (i * 7 % 1000) / 4.0)).toDF("g", "x", "y")
    val a = Stats.olsExact(df.repartition(1), col("g"), col("x"), col("y"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val b = Stats.olsExact(df.repartition(17), col("g"), col("x"), col("y"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  // ---------------------------------------------- hierarchy flattening ----

  test("hierarchy flatten: chain + forest roots + branching") {
    // forest: chain 1<-2<-3<-4<-5, separate root 10 with children 11,12
    val nodes = Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(2L)), (4L, Some(3L)),
      (5L, Some(4L)), (10L, None), (11L, Some(10L)), (12L, Some(10L)))
      .toDF("id", "parent")
    val got = Hierarchy.flatten(nodes).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSeq
    assert(got === Seq(
      (1L, 1L, 0, "1"), (2L, 1L, 1, "1/2"), (3L, 1L, 2, "1/2/3"),
      (4L, 1L, 3, "1/2/3/4"), (5L, 1L, 4, "1/2/3/4/5"),
      (10L, 10L, 0, "10"), (11L, 10L, 1, "10/11"), (12L, 10L, 1, "10/12")))
  }

  test("hierarchy flatten: 200-deep chain finishes (log-round doubling)") {
    val nodes = (1L to 200L).map(i =>
      (i, if (i == 1L) None else Some(i - 1L))).toDF("id", "parent")
    val deepest = Hierarchy.flatten(nodes).where(col("id") === 200L)
      .collect().head
    assert(deepest.getLong(1) === 1L)
    assert(deepest.getInt(2) === 199)
    assert(deepest.getString(3) === (1L to 200L).mkString("/"))
  }

  test("hierarchy flatten fails loudly on a cycle") {
    val nodes = Seq((1L, Some(2L)), (2L, Some(1L))).toDF("id", "parent")
    intercept[IllegalArgumentException] {
      Hierarchy.flatten(nodes, maxRounds = 4).collect()
    }
  }
}
