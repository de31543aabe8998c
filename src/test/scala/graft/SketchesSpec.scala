package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Compaction, Hierarchy, Reconcile, Sketches, Stats}

/** Specs for the E37-E43/L27 batch: Misra-Gries heavy hitters (sketch
  * guarantees + exact output), anti-entropy table checksums,
  * decimal-exact OLS, pointer-doubling hierarchy flattening, the
  * fold-deterministic chi-square statistic, and golden-record
  * survivorship.
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

  test("hierarchy flatten matches a naive in-memory walk on random forests") {
    val rnd = new scala.util.Random(0xC0FFEE)
    for (trial <- 1 to 3) {
      val n = 150 + trial * 50
      // random forest: node i (1-based) gets a parent < i or none
      val parent: Map[Long, Option[Long]] = (1L to n.toLong).map { i =>
        i -> (if (i == 1L || rnd.nextInt(10) == 0) None
              else Some(1L + rnd.nextInt((i - 1).toInt)))
      }.toMap
      def walk(i: Long): (Long, Int, String) = parent(i) match {
        case None => (i, 0, i.toString)
        case Some(p) =>
          val (r, d, path) = walk(p); (r, d + 1, s"$path/$i")
      }
      val nodes = parent.toSeq.map { case (i, p) => (i, p) }
        .toDF("id", "parent").repartition(7)
      val got = Hierarchy.flatten(nodes).orderBy("id").collect()
        .map(r => (r.getLong(1), r.getInt(2), r.getString(3))).toSeq
      val want = (1L to n.toLong).map(walk)
      assert(got === want, s"trial $trial n=$n")
    }
  }

  test("hierarchy flatten fails loudly on a cycle") {
    val nodes = Seq((1L, Some(2L)), (2L, Some(1L))).toDF("id", "parent")
    intercept[IllegalArgumentException] {
      Hierarchy.flatten(nodes, maxRounds = 4).collect()
    }
  }

  // ------------------------------------------------------- chiSquare ------

  test("chiSquare matches a hand-computed 2x2 table incl. empty cell") {
    // observed: (a,0)=30, (a,1)=10, (b,0)=20, (b,1)=0 (empty cell)
    val rows = Seq.fill(30)(("a", 0)) ++ Seq.fill(10)(("a", 1)) ++
      Seq.fill(20)(("b", 0))
    val df = rows.toDF("g", "d")
    val r = Stats.chiSquare(df, col("g"), col("d")).collect().head
    // marginals: ra=40 rb=20 c0=50 c1=10 n=60
    val e = Map(("a", 0) -> 40.0 * 50 / 60, ("a", 1) -> 40.0 * 10 / 60,
      ("b", 0) -> 20.0 * 50 / 60, ("b", 1) -> 20.0 * 10 / 60)
    val o = Map(("a", 0) -> 30.0, ("a", 1) -> 10.0, ("b", 0) -> 20.0,
      ("b", 1) -> 0.0)
    val expected = e.keys.toSeq.sortBy(k => (k._1, k._2))
      .foldLeft(0.0) { (acc, k) =>
        acc + (o(k) - e(k)) * (o(k) - e(k)) / e(k) }
    assert(r.getAs[Double]("chi2") === expected)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Long]("n_rows") === 60L)
    assert(r.getAs[Long]("n_cells") === 4L)
  }

  test("chiSquare is bit-identical across partitionings") {
    val df = (1 to 9000).map(i => (s"g${i % 4}", (i * 13) % 7))
      .toDF("g", "d")
    val a = Stats.chiSquare(df.repartition(1), col("g"), col("d"))
      .collect().head.toSeq
    val b = Stats.chiSquare(df.repartition(23), col("g"), col("d"))
      .collect().head.toSeq
    assert(a === b)
  }

  // ---------------------------------------------------- goldenRecord ------

  test("goldenRecord resolves each column independently") {
    // user 1: purchase at t2, error at t1; user 2: no purchase at all
    val df = Seq(
      (1L, 10L, "view", 5.0), (1L, 20L, "purchase", 7.5),
      (1L, 30L, "view", 1.0), (1L, 15L, "error", 0.0),
      (2L, 40L, "view", 2.0), (2L, 50L, "click", 3.0))
      .toDF("u", "t", "typ", "v")
    val got = Compaction.goldenRecord(df, col("u"), col("t"), Seq(
        ("last_type", col("typ"), lit(true)),
        ("last_purchase_v", col("v"), col("typ") === "purchase"),
        ("last_error_t", col("t"), col("typ") === "error")))
      .orderBy("key").collect()
    assert(got(0).toSeq === Seq(1L, "view", 7.5, 15L, 4L))
    // user 2: no purchase / no error -> independent NULLs, last_type set
    assert(got(1).getLong(0) === 2L)
    assert(got(1).getString(1) === "click")
    assert(got(1).isNullAt(2) && got(1).isNullAt(3))
    assert(got(1).getLong(4) === 2L)
  }
}
