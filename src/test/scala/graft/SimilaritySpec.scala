package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("cosine: identical → 1, orthogonal → 0, opposite → -1") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0),
    ).toDF("a", "b", "want")
    df.select(Similarity.cosine($"a", $"b").as("got"), $"want").collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("brute-force top-k excludes self, is rank-ordered, k rows per query") {
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val out = Similarity.bruteForceTopK(e.where($"id" < 5), e, k = 3)
      .orderBy($"query_id", $"rank").collect()
    assert(out.length === 15)
    out.foreach(r => assert(
      r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val sims = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.sorted.reverse.toSeq === sims.toSeq)
    }
  }

  test("LSH ANN returns a subset of true candidates with exact scores") {
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val brute = Similarity.bruteForceTopK(e.where($"id" < 5), e, k = 20)
      .select($"query_id", $"neighbor_id", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.annTopKLsh(e.where($"id" < 5), e, k = 5,
      nPlanes = 6, tables = 8)
      .select($"query_id", $"neighbor_id", $"cos").collect()
    assert(lsh.nonEmpty)
    // every LSH hit that the brute-force top-20 also saw carries the exact
    // same (bit-identical) cosine — LSH only restricts candidates
    lsh.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1))).foreach { want =>
        assert(r.getDouble(2) === want)
      }
    }
  }

  test("IVF Lloyd refine: deterministic, seed-id-keyed, and moves a centroid") {
    import graft.operators.IvfIndex
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val r1 = IvfIndex.refine(e, nCells = 8, rounds = 2)
    val r2 = IvfIndex.refine(e, nCells = 8, rounds = 2)
    val c1 = r1.orderBy($"id").collect()
    val c2 = r2.orderBy($"id").collect()
    // determinism: bit-identical centroids run to run (the oracle-replay
    // precondition — nothing in assign/means may depend on partitioning)
    assert(c1.map(_.getLong(0)).toSeq === c2.map(_.getLong(0)).toSeq)
    assert(c1.zip(c2).forall { case (a, b) =>
      a.getSeq[Double](1) == b.getSeq[Double](1) })
    // cells keep their seed ids; each centroid has the corpus dims
    assert(c1.map(_.getLong(0)).toSet === (0L until 8L).toSet)
    val dims = e.select(size($"vec")).head().getInt(0)
    assert(c1.forall(_.getSeq[Double](1).length == dims))
    // refinement actually moved at least one centroid off its seed
    val seeds = IvfIndex.seedCentroids(e, 8).orderBy($"id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    assert(c1.exists(r => r.getSeq[Double](1) != seeds(r.getLong(0))))
    // refined cells stay non-degenerate: every member still joins a cell,
    // so a probe over refined centroids sees the whole corpus partitioned
    val assigned = IvfIndex.assign(e, r1)
    assert(assigned.count() === e.count())
  }

  test("int8 quantization: codes bounded, reconstruction within scale/2, " +
      "q8 top-5 recall vs full precision") {
    import spark.implicits._
    import graft.operators.Quantize
    val e = Tables.embeddings(spark, sf)
    // codes live in [-127, 127]; dequantized error <= scale/2 per element
    val checked = e.select($"vec_id", $"embedding",
        Quantize.int8Scale($"embedding").as("scale"),
        Quantize.int8Codes($"embedding").as("q"))
      .select($"vec_id", $"scale",
        aggregate($"q", lit(0), (m, x) => greatest(m, abs(x))).as("max_code"),
        aggregate(zip_with($"embedding", $"q",
            (v, c) => abs(v.cast("double") - c.cast("double") * $"scale")),
          lit(0.0), (m, x) => greatest(m, x)).as("max_err"))
      .collect()
    checked.foreach { r =>
      assert(r.getAs[Int]("max_code") <= 127)
      assert(r.getAs[Double]("max_err") <= r.getAs[Double]("scale") / 2 + 1e-12)
    }
    // retrieval quality: q8 rank-5 lists recover >= 80% of the
    // full-precision rank-5 neighbors on this corpus
    val full = Queries.annTopk(spark, sf)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val q8 = Queries.annTopkQ8(spark, sf)
      .where($"query_id" < 10) // annTopk's query set
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (full intersect q8).size.toDouble / full.size
    assert(recall >= 0.8, s"q8 recall@5 = $recall")
  }

  test("duplicate-vector collapse: amplified corpus equals the naive pairs") {
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val amplified = (0 until 3).map(r =>
      e.withColumn("vec_id", $"vec_id" + lit(r * 1000000L)))
      .reduce(_ unionByName _)
    val got = Similarity.cosinePairs(amplified, $"vec_id", $"embedding", 0.46)
      .orderBy($"id_a", $"id_b").collect().toSeq
    // naive truth, independent of the collapse machinery
    val v = amplified.select($"vec_id".as("id"), $"embedding".as("v"))
    val naive = v.select($"id".as("id_a"), $"v".as("v_a"))
      .crossJoin(v.select($"id".as("id_b"), $"v".as("v_b")))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        Similarity.cosine($"v_a", $"v_b").as("cos"))
      .where($"cos" >= 0.46)
      .orderBy($"id_a", $"id_b").collect().toSeq
    assert(got === naive)
    assert(got.size > e.count()) // the verbatim copies pair up
    // the LSH path collapses identical vectors too (bucket collisions
    // would otherwise grow as dup_factor²) and still equals the truth
    val lsh = Similarity.lshCosinePairs(amplified, $"vec_id", $"embedding", 0.46)
      .orderBy($"id_a", $"id_b").collect().toSeq
    assert(lsh === naive)
  }

  test("lshCosineEdges components equal lshCosinePairs components") {
    // dup-heavy corpus: the full pair list goes quadratic in the copy
    // count; the star+rep-pair edge set stays linear with identical
    // connectivity — so min-label components must be bit-identical
    val e = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val amplified = (0 until 3).map(r =>
      e.withColumn("vec_id", $"vec_id" + lit(r * 1000000L)))
      .reduce(_ unionByName _)
    val ids = amplified.select($"vec_id".as("id"))
    val viaPairs = graft.operators.Dedup.clusters(ids,
        Similarity.lshCosinePairs(amplified, $"vec_id", $"embedding", 0.46)
          .select($"id_a", $"id_b"))
      .orderBy($"id").collect().toSeq
    val edges = Similarity.lshCosineEdges(amplified, $"vec_id",
      $"embedding", 0.46)
    val viaEdges = graft.operators.Dedup.clusters(ids, edges)
      .orderBy($"id").collect().toSeq
    assert(viaEdges === viaPairs)
    val nPairs = Similarity
      .lshCosinePairs(amplified, $"vec_id", $"embedding", 0.46).count()
    assert(edges.count() < nPairs)
  }

  test("lshCosinePairs at registered params equals the exact truth") {
    // the dedup_embedding_lsh contract: with the default 6-plane/128-table
    // parameterization, LSH candidates cover every true pair of this corpus
    // (measured recall 1.0, per-pair miss bound 3.5e-5 at the worst pair)
    // and the exact verify makes false positives impossible — so output ==
    // all-pairs truth, scores bit-identical
    val e = Tables.embeddings(spark, sf)
    val exact = Similarity.cosinePairs(e, $"vec_id", $"embedding", 0.46)
      .select($"id_a", $"id_b", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Similarity.lshCosinePairs(e, $"vec_id", $"embedding", 0.46)
      .select($"id_a", $"id_b", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === exact)
  }
}
