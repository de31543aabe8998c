package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2 L1-L5), all designed so the shuffled
  * rows are tiny (hashes/ids, never documents) and candidate generation is
  * bucket-local — at 100 TB nothing here is an all-pairs join.
  *
  * Determinism: every hash is either md5 (replayable in the DuckDB oracle) or
  * Spark's xxhash64 with its fixed seed (stable across JVMs/executors), and
  * MinHash "permutations" are fixed odd-multiplier affine maps over the token
  * hash — no RNG anywhere.
  */
object Dedup {

  // ---------------------------------------------------------------- exact --

  /** Exact dedup: group by content hash, keep the smallest id. The projection
    * (hash, id) happens before the shuffle, so shuffle rows are ~50 B
    * regardless of document size.
    */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(md5(text).as("fp"), id.as("id"))
      .groupBy(col("fp"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup after canonical normalization (case/punct/ws-insensitive). */
  def exactNormalized(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(TextAnalysis.fingerprint(text).as("fp"), id.as("id"))
      .groupBy(col("fp"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Incremental dedup: deduplicate an incoming batch against an existing
    * corpus — the shape of every recurring crawl/ingest. Both sides reduce
    * to 16-byte content hashes BEFORE the anti-join, so at 100 TB the
    * shuffle moves ~50 B/row no matter how large the documents are, and the
    * corpus side is a pre-computable fingerprint table (at real scale: kept
    * as a bucketed table or bloom-filter pushdown so only the incoming side
    * shuffles).
    *
    * Output: one row per *new* content (not present in corpus), with the
    * smallest incoming id and the within-batch duplicate count.
    */
  def incremental(incoming: DataFrame, corpus: DataFrame,
      id: Column, text: Column): DataFrame = {
    val corpusFps = corpus.select(md5(text).as("fp")).distinct()
    incoming.select(md5(text).as("fp"), id.as("id"))
      .join(corpusFps, Seq("fp"), "left_anti")
      .groupBy(col("fp"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("dup_count"))
  }

  // ------------------------------------------------------------- shingles --

  /** Distinct word n-gram shingles of the normalized text — native one-pass
    * kernel ([[graft.functions.WordShingles]]); the lambda-composed
    * formulation was the profiled hotspot of the whole dedup pipeline.
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.TextFunctions.wordShingles(TextAnalysis.normalize(text), n)

  /** Exact Jaccard similarity of two shingle-array columns — int/int double,
    * so bit-identical across engines.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }

  /** Exact n-gram-Jaccard near-dup pairs via a *blocked* self-join: only
    * pairs sharing a block key are compared. At test scale the block is a
    * metadata column; at 100 TB the LSH variant below replaces blocking.
    * Output: (id_a, id_b, jac) with id_a < id_b, jac ≥ threshold.
    */
  def jaccardPairs(docs: DataFrame, id: Column, text: Column, block: Column,
      threshold: Double, n: Int = 3): DataFrame = {
    // four consumers (candidate a/b sides + verify a/b sides): cache once
    val s = docs.select(id.as("id"), block.as("blk"), shingles(text, n).as("sh"))
      .cache()
    val a = s.select(col("id").as("id_a"), col("blk"))
    val b = s.select(col("id").as("id_b"), col("blk"))
    val candidates = a.join(b, Seq("blk")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    verifyJaccard(candidates, s.select(col("id"), col("sh")), threshold)
  }

  // -------------------------------------------------------------- minhash --

  /** Fixed affine "permutations" h_i(x) = a_i*x + b_i over the xxhash64 token
    * hash (64-bit wrap-around). Odd multipliers ⇒ bijective mod 2^64.
    * Derived from splitmix64 so they are reproducible constants, not RNG.
    */
  private def mixers(k: Int): Seq[(Long, Long)] = {
    var state = 0x9E3779B97F4A7C15L
    def next(): Long = {
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Seq.fill(k)((next() | 1L, next()))
  }

  /** MinHash signatures in the *exploded* shape: one row per (doc, shingle)
    * → xxhash64 once → k affine maps as k tiny agg expressions in ONE
    * groupBy(id). This is both the 100 TB shape (narrow shuffle rows, one
    * aggregation) and the Catalyst-friendly shape — building the signature
    * as 64 nested `transform` lambdas over an inlined shingle expression
    * blows the optimizer up quadratically.
    *
    * Output: (id, m0..m{k-1}) — one long column per signature slot.
    */
  def minhashSigs(shingled: DataFrame, k: Int): DataFrame = {
    val exploded = shingled
      .select(col("id"), explode(col("sh")).as("shingle"))
      .select(col("id"), xxhash64(col("shingle")).as("h"))
    val aggs = mixers(k).zipWithIndex.map { case ((a, b), i) =>
      min(col("h") * lit(a) + lit(b)).as(s"m$i")
    }
    exploded.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash+LSH near-dup pairs, exact-verified:
    * shingles → explode → xxhash64 → groupBy(id) k-slot signature →
    * band keys (xxhash64 of each band's slots) → explode bands (b tiny
    * rows/doc) → shuffle on (band, key) → bucket-local candidate id pairs →
    * re-join shingle arrays → exact-Jaccard verification.
    * With the standard (bands, rows) S-curve the verified output equals the
    * exact-threshold truth with probability ~1 − (1 − t^r)^b; callers pick
    * parameters so the miss probability at their threshold is negligible
    * (16×4 at t ≥ 0.9 ⇒ < 1e-7).
    *
    * Output: (id_a, id_b, jac) — same contract as [[jaccardPairs]], so the
    * DuckDB oracle for the exact computation doubles as the oracle here.
    */
  def minhashPairs(docs: DataFrame, id: Column, text: Column,
      threshold: Double, n: Int = 3, k: Int = 64,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    require(bands * rowsPerBand <= k, "bands*rowsPerBand must be <= k")
    // the shingle table feeds banding AND both sides of the verify join —
    // cache it so the shingle/signature pipeline runs once, not four times
    val shingled = docs.select(id.as("id"), shingles(text, n).as("sh")).cache()
    val sigs = minhashSigs(shingled, k)
    val bandKeyCols = (0 until bands).map { b =>
      val slots = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      xxhash64((lit(b.toLong) +: slots): _*)
    }
    val banded = sigs.select(col("id"),
      posexplode(array(bandKeyCols: _*)).as(Seq("band_idx", "band_key")))
    val candidates = banded.as("a")
      .join(banded.as("b"), Seq("band_idx", "band_key"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(candidates, shingled, threshold)
  }

  /** Exact-Jaccard verification of candidate id pairs against the shingle
    * table. Set operations run on xxhash64'd shingles (long arrays) — far
    * cheaper than string intersection, identical sizes barring a within-pair
    * 64-bit collision (P ≈ 5e-15 per pair). Pairs whose sizes already rule
    * out the threshold (Jaccard bound: min(n_a,n_b)·(1+θ) ≥ θ·(n_a+n_b))
    * are skipped before any intersection; the 0.5 slack keeps the float
    * prefilter a strict superset of the exact predicate.
    */
  private def verifyJaccard(candidates: DataFrame, shingled: DataFrame,
      threshold: Double): DataFrame = {
    val hashed = shingled.select(col("id"),
      array_sort(transform(col("sh"), s => xxhash64(s))).as("shh"),
      size(col("sh")).as("n"))
    val shA = hashed.select(col("id").as("id_a"), col("shh").as("sh_a"),
      col("n").as("na"))
    val shB = hashed.select(col("id").as("id_b"), col("shh").as("sh_b"),
      col("n").as("nb"))
    candidates.join(shA, "id_a").join(shB, "id_b")
      .where(least(col("na"), col("nb")) * lit(1.0 + threshold) >=
        lit(threshold) * (col("na") + col("nb")) - 0.5)
      .select(col("id_a"), col("id_b"),
        graft.functions.JaccardFunctions
          .sortedJaccard(col("sh_a"), col("sh_b")).as("jac"))
      .where(col("jac") >= threshold)
  }

  // -------------------------------------------------------------- simhash --

  /** 64-bit SimHash per doc in the exploded shape: one row per (doc, token)
    * → xxhash64 → 64 per-bit counting aggs in one groupBy(id); bit b of the
    * result is 1 iff more token hashes have bit b set than clear. Same
    * rationale as [[minhashSigs]]: k small agg expressions over narrow rows
    * beat one giant nested-lambda expression.
    *
    * Output: (id, sh64).
    */
  def simhashTable(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val exploded = docs
      .select(id.as("id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalize(text))).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val bitCounts = (0 until 64).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"c$b"))
    val counted = exploded.groupBy(col("id"))
      .agg(count(lit(1)).as("n"), bitCounts: _*)
    val sh64 = (0 until 64).map(b =>
      when(col(s"c$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    counted.select(col("id"), sh64.as("sh64"))
  }

  /** SimHash candidate pairs with hamming distance ≤ maxDist.
    *
    * Candidate generation is banded + multiprobed (Manku-style): the 64-bit
    * simhash splits into 8 byte chunks; the index side emits each chunk
    * exactly, the probe side emits the chunk plus all 8 one-bit flips. By
    * pigeonhole, a pair at hamming d ≤ 15 has some chunk where the two
    * fingerprints differ in ≤ 1 bit, so the flip probe hits — recall is
    * *structural* for maxDist ≤ 15, not tuned. The join stays bucket-local
    * ((band, chunk-key) shuffle), never all-pairs.
    */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
      maxDist: Int = 15): DataFrame = {
    require(maxDist <= 15, "banding guarantees recall only for maxDist <= 15")
    val s = simhashTable(docs, id, text)
    val bands = 8
    val chunkOf = (b: Int) =>
      shiftright(col("sh64"), b * 8).bitwiseAND(lit(0xFFL))
    val indexSide = s.select(col("id"), col("sh64"),
      posexplode(array((0 until bands).map(chunkOf): _*))
        .as(Seq("q_idx", "q_key")))
    // probe side: the chunk itself plus every 1-bit variant of it
    val probeSide = s.select(col("id"), col("sh64"),
      inline(array((0 until bands).flatMap { b =>
        (chunkOf(b) +: (0 until 8).map(j =>
          chunkOf(b).bitwiseXOR(lit(1L << j))))
          .map(k => struct(lit(b).cast("int").as("q_idx"), k.as("q_key")))
      }: _*)))
    val aSide = indexSide.select(col("q_idx"), col("q_key"),
      col("id").as("id_a"), col("sh64").as("h_a"))
    val bSide = probeSide.select(col("q_idx"), col("q_key"),
      col("id").as("id_b"), col("sh64").as("h_b"))
    aSide.join(bSide, Seq("q_idx", "q_key"))
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .where(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming")).distinct()
  }

  /** SimHash-LSH near-dup dedup, exact-verified: simhash candidates
    * (hamming ≤ maxDist, structural recall — see [[simhashPairs]]) →
    * exact-Jaccard verification ≥ threshold. Same output contract as
    * [[minhashPairs]], so the exact-threshold truth is the oracle whenever
    * every true pair sits within the hamming budget (measured: max true-pair
    * hamming 5/9/12 at sf0.01/0.001/0.1 vs budget 15).
    */
  def simhashNearDup(docs: DataFrame, id: Column, text: Column,
      threshold: Double, maxDist: Int = 15, n: Int = 3): DataFrame = {
    val shingled = docs.select(id.as("id"), shingles(text, n).as("sh")).cache()
    val candidates = simhashPairs(docs, id, text, maxDist)
      .select(col("id_a"), col("id_b"))
    verifyJaccard(candidates, shingled, threshold)
  }

  // ------------------------------------------------------------- clusters --

  /** Connected components over near-dup pairs: every doc gets the minimum
    * id reachable through the pair graph (`root`), so "keep one per
    * cluster" = `where id = root`. Iterative min-label propagation — each
    * round is two shuffles (join + agg), and rounds needed = graph diameter
    * (near-dup clusters are shallow; `maxIter` bounds pathological chains).
    * The driver loop only checks a convergence count per round; labels
    * never leave the cluster.
    */
  def clusters(ids: DataFrame, pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // undirected edge list, both directions; localCheckpoint truncates the
    // per-iteration lineage (otherwise every round replans the whole
    // history) and materializes the reused frame
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var labels = ids.select(col("id"), col("id").as("root")).localCheckpoint()
    // min-label propagation decreases sum(root) monotonically; an unchanged
    // sum means a fixpoint — a single-agg convergence probe, no self-join
    def rootSum(df: DataFrame): Long =
      df.agg(sum(col("root"))).head().getLong(0)
    var prevSum = rootSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("root"))
      labels = labels.unionByName(viaNeighbors)
        .groupBy(col("id")).agg(min(col("root")).as("root"))
        .localCheckpoint()
      val s = rootSum(labels)
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    labels
  }

  // ---------------------------------------------------- embedding near-dup --

  /** Embedding-cosine near-dup pairs ≥ threshold. Exact (blocked only by the
    * similarity join in [[Similarity]]); see `Similarity.cosinePairs`.
    */
  def embeddingPairs(vectors: DataFrame, id: Column, vec: Column,
      threshold: Double): DataFrame =
    Similarity.cosinePairs(vectors, id, vec, threshold)
}
