package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index construction: term → document frequency + postings list,
  * the retrieval-side sibling of the TF-IDF operator (SURVEY §2 L17) and
  * the index a decontamination/attribution pass queries at scale.
  *
  * Shape: per-doc distinct terms come from `array_distinct` BEFORE the
  * explode — a narrow map, so each (term, doc) pair reaches the shuffle
  * exactly once and the single `groupBy(term)` both counts df and folds
  * the postings. One shuffle total; no `distinct` pre-pass.
  *
  * 100 TB posture: postings for corpus-hot terms (stopwords) are the skew
  * risk — `minDf` prunes the long tail of hapaxes while `maxPostings`
  * caps the hot heads (`slice` after sort keeps the cap deterministic:
  * the lowest doc ids). Real IR systems shard hot postings; the cap is
  * the single-table stand-in and is always reported alongside the true
  * `df`, so no information about term frequency is lost.
  */
object Indexing {

  /** Build term → (df, postings) over `docs`. Postings are the sorted
    * distinct doc ids, comma-joined into a string (engine-portable; array
    * outputs don't round-trip the oracle's row sort), capped at
    * `maxPostings` ids.
    */
  def invertedIndex(docs: DataFrame, id: Column, text: Column,
      minDf: Long = 2L, maxPostings: Int = 1000): DataFrame = {
    val terms = docs.select(id.as("doc"),
      explode(array_distinct(split(TextAnalysis.normalize(text), " ")))
        .as("term"))
      .where(length(col("term")) >= 2)
    terms.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        array_join(transform(slice(array_sort(collect_list(col("doc"))),
          1, maxPostings), _.cast("string")), ",").as("postings"))
      .where(col("df") >= minDf)
  }
}
