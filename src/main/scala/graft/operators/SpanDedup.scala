package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document duplicated-SPAN detection — the word-window
  * approximation of exact-substring training-data dedup (the
  * suffix-array ExactSubstr pass): rolling `n`-word windows at EVERY word
  * offset (stride 1 — contrast the aligned stride-10 segmentation of
  * line-level dedup), hashed to 16 bytes; a window is duplicated when it
  * occurs in ≥ 2 distinct documents.
  *
  * Recall is structural: any shared span of ≥ n words contains a shared
  * n-window at every offset inside it, so span-level duplication is never
  * missed, only quantized to window granularity.
  *
  * Scale shape: the window explode is narrow (≈ words-per-doc rows, each
  * a 16-byte hash + ids — the text itself never rides the shuffle); ONE
  * groupBy on the hash finds cross-doc windows; the join back is
  * co-partitioned on the same hash key (exchange reuse); one final
  * groupBy(doc) — every stage linear in corpus size, nothing quadratic,
  * no driver state. The window key is TWO xxhash64 halves (128 bits as
  * a 16-byte long pair, collision P ≈ 5e-21 at 450M windows — the md5
  * contract) rather than the md5 HEX STRING an earlier form shuffled:
  * the string key was 40+ B/row through both hash exchanges and their
  * sorts, ~2.5× the bytes of the integer pair, and key hashing and
  * equality were byte-loops instead of long compares (r15; the output
  * columns carry no hash, so the DuckDB md5 oracle replays unchanged).
  */
object SpanDedup {

  /** Per-document duplicated-span statistics: `n_windows` (rolling
    * `n`-word windows in the normalized text), `n_dup` (how many of them
    * also occur in another document), `dup_frac` (int/int double; 0.0
    * for docs shorter than `n` words).
    */
  def spanStats(docs: DataFrame, id: Column, text: Column,
      n: Int): DataFrame = {
    require(n >= 2, s"window must be >= 2 words, got $n")
    val base = docs
      .select(id.as("doc_id"), split(TextAnalysis.normalize(text), " ").as("w"))
      .withColumn("nw", size(col("w")).cast("long"))
    // the window string materializes ONCE per instance (map-side only,
    // dropped before the shuffle) and both hash halves read it — hashing
    // inside the transform lambda would re-evaluate the array_join per
    // half (measured 1.3x on the whole query)
    val wins = base.where(col("nw") >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), (col("nw") - n).cast("int")),
          i => array_join(slice(col("w"), i + 1, lit(n)), " "))).as("ws"))
      .select(col("doc_id"), struct(xxhash64(col("ws")).as("h1"),
        xxhash64(col("ws"), lit(1L)).as("h2")).as("h"))
    val shared = wins.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2).select(col("h"))
    val dup = wins.join(shared, "h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    base
      .select(col("doc_id"),
        greatest(col("nw") - (n - 1), lit(0L)).as("n_windows"))
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(col("n_windows") > 0L,
          coalesce(col("n_dup"), lit(0L)).cast("double") /
            col("n_windows").cast("double"))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Per-document n-gram NOVELTY — the corpus-order mirror of
    * [[spanStats]]: a window instance is novel when its hash FIRST
    * appears (min doc_id over the corpus) in this document, so novelty
    * = fraction of the doc's windows introducing never-before-seen
    * n-grams — the memorization-risk / contribution signal behind
    * "does this source still add new text, or restate the corpus?"
    * (every instance inside the introducing doc counts novel; repeats
    * in LATER docs do not — the L37 first-occurrence discipline on
    * spans instead of tokens). Docs shorter than `n` words report
    * novelty 1.0 (nothing restated). Same linear shape as spanStats:
    * one hash groupBy (min doc), one co-partitioned join back.
    */
  def noveltyStats(docs: DataFrame, id: Column, text: Column,
      n: Int): DataFrame = {
    require(n >= 2, s"window must be >= 2 words, got $n")
    val base = docs
      .select(id.as("doc_id"), split(TextAnalysis.normalize(text), " ").as("w"))
      .withColumn("nw", size(col("w")).cast("long"))
    val wins = base.where(col("nw") >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), (col("nw") - n).cast("int")),
          i => array_join(slice(col("w"), i + 1, lit(n)), " "))).as("ws"))
      .select(col("doc_id"), struct(xxhash64(col("ws")).as("h1"),
        xxhash64(col("ws"), lit(1L)).as("h2")).as("h"))
    val first = wins.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    val novel = wins.join(first, "h")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
        .as("n_novel"))
    base
      .select(col("doc_id"),
        greatest(col("nw") - (n - 1), lit(0L)).as("n_windows"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_windows") > 0L,
          coalesce(col("n_novel"), lit(0L)).cast("double") /
            col("n_windows").cast("double"))
          .otherwise(lit(1.0)).as("novelty"))
  }
}
