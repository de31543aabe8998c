package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §2 L5/L6).
  *
  * Numeric contract (SURVEY §6): floats are widened to double, each product
  * is exact, and the sum is a *left fold* (`aggregate`), so the value is
  * bit-identical to the DuckDB oracle's `list_reduce` fold — any comparison
  * margin above ~1e-15 relative is then safe, including top-k rank cuts.
  *
  * Scale path: brute force is O(Q·N) and is kept as the correctness
  * baseline; `lshBuckets`/`annTopKLsh` bucket vectors by Rademacher
  * hyperplane sign-bits so candidate generation shuffles on the bucket key
  * and compares only within buckets (+ optional multi-probe neighbors).
  */
object Similarity {

  /** Left-fold dot product of two array<float/double> columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the native codegen'd kernel
    * ([[graft.functions.CosineSim]]); bit-identical to
    * `dot(a,b) / (norm(a) * norm(b))` — same fold order, fused loop.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  /** All-pairs cosine ≥ threshold (id_a < id_b). Exact; at scale use
    * [[lshCosinePairs]].
    *
    * Like the text near-dup family (Dedup.overTextGroups), identical
    * vectors collapse to one representative before the quadratic compare —
    * embedding corpora deduplicate exactly when documents do, and every
    * member of an identical-vector group scores the same cosine against
    * everything (intra-group pairs score cosine(v, v), computed once per
    * group — NOT assumed 1.0: the float norm product rounds). A two-count
    * statistic skips the collapse on duplicate-free input.
    */
  def cosinePairs(vectors: DataFrame, id: Column, vec: Column,
      threshold: Double): DataFrame = {
    val v = vectors.select(id.as("id"), vec.as("v"))
    val members = v.select(xxhash64(col("v")).as("gk"), col("id"), col("v"))
      .cache()
    val counts = members.agg(count(lit(1)).as("n"),
      countDistinct(col("gk")).as("d")).head()
    if (counts.getLong(0) == counts.getLong(1)) {
      members.unpersist()
      return cosinePairsRaw(v, threshold)
    }
    val groups = members.groupBy(col("gk")).agg(min(col("id")).as("rid"))
    val reps = members.join(groups.select(col("rid").as("id")), "id")
    val repPairs = cosinePairsRaw(reps.select(col("id"), col("v")), threshold)
    val gkOf = groups.select(col("rid"), col("gk"))
    val cross = repPairs
      .join(gkOf.select(col("rid").as("id_a"), col("gk").as("gk_a")), "id_a")
      .join(gkOf.select(col("rid").as("id_b"), col("gk").as("gk_b")), "id_b")
      .join(members.select(col("gk").as("gk_a"), col("id").as("ma")), "gk_a")
      .join(members.select(col("gk").as("gk_b"), col("id").as("mb")), "gk_b")
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("cos"))
    val selfCos = reps.select(col("id").as("rid"),
      cosine(col("v"), col("v")).as("cos"))
    val intra = members.select(col("gk"), col("id").as("id_a"))
      .join(members.select(col("gk"), col("id").as("id_b")), "gk")
      .where(col("id_a") < col("id_b"))
      .join(gkOf, "gk")
      .join(selfCos, "rid")
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
    cross.unionByName(intra)
  }

  private def cosinePairsRaw(v: DataFrame, threshold: Double): DataFrame = {
    val a = v.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = v.select(col("id").as("id_b"), col("v").as("v_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("v_a"), col("v_b")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Brute-force exact top-k cosine neighbors for each query row.
    * `queries`/`corpus` both expose (id, vec). Excludes self-matches by id.
    * Rank ties broken by neighbor id (total order ⇒ deterministic).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("id").as("query_id"), col("vec").as("q_vec"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("c_vec"))
    val scored = q.join(broadcast(c), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
  }

  // ------------------------------------------------------------------ LSH --

  /** Deterministic Rademacher (±1) hyperplanes: plane p, dim d from
    * splitmix64(p*dims + d) sign bit. Constants, not RNG — reproducible.
    */
  def rademacherPlanes(nPlanes: Int, dims: Int): Seq[Seq[Double]] = {
    def splitmix(x0: Long): Long = {
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (0 until nPlanes).map(p => (0 until dims).map(d =>
      if (splitmix(p.toLong * dims + d) >= 0L) 1.0 else -1.0))
  }

  /** Sign-bit bucket id (long) of a vector under the given planes. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val proj = aggregate(
        zip_with(vec, typedLit(plane), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Cosine near-dup pairs at scale: bucket on hyperplane signature, compare
    * within bucket only, exact-verify with [[cosine]]. Recall rises with
    * `tables` independent plane sets (standard banded sign-LSH).
    */
  def lshCosinePairs(vectors: DataFrame, id: Column, vec: Column,
      threshold: Double, nPlanes: Int = 12, tables: Int = 4,
      dims: Int = 64): DataFrame = {
    val v = vectors.select(id.as("id"), vec.as("v"))
    val buckets = (0 until tables).map { t =>
      v.select(col("id"), col("v"), lit(t).as("tbl"),
        lshBucket(col("v"), rotate(rademacherPlanes(nPlanes, dims), t)).as("bucket"))
    }.reduce(_ unionByName _)
    val a = buckets.select(col("tbl"), col("bucket"),
      col("id").as("id_a"), col("v").as("v_a"))
    val b = buckets.select(col("tbl"), col("bucket"),
      col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("tbl", "bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("v_a"), col("v_b")).distinct()
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Distinct plane set per table: rotate each plane's weights. */
  private def rotate(planes: Seq[Seq[Double]], t: Int): Seq[Seq[Double]] =
    if (t == 0) planes
    else planes.map(p => p.drop(t % p.size) ++ p.take(t % p.size))

  /** ANN top-k via LSH candidate buckets, exact re-rank inside the union of
    * a query's buckets. Falls back to fewer than k results when buckets are
    * sparse — the caller can multi-probe by raising `tables`.
    */
  def annTopKLsh(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 10, tables: Int = 6, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qb = (0 until tables).map { t =>
      queries.select(col("id").as("query_id"), col("vec").as("q_vec"),
        lit(t).as("tbl"),
        lshBucket(col("vec"), rotate(rademacherPlanes(nPlanes, dims), t)).as("bucket"))
    }.reduce(_ unionByName _)
    val cb = (0 until tables).map { t =>
      corpus.select(col("id").as("neighbor_id"), col("vec").as("c_vec"),
        lit(t).as("tbl"),
        lshBucket(col("vec"), rotate(rademacherPlanes(nPlanes, dims), t)).as("bucket"))
    }.reduce(_ unionByName _)
    val cand = qb.join(cb, Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("q_vec"), col("neighbor_id"), col("c_vec"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
  }
}
