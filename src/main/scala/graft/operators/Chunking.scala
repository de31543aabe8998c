package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window document chunking — the "split every document into
  * fixed-size training windows" step of an LLM data pipeline.
  *
  * Pure narrow transformation: words → `sequence`/`posexplode` over chunk
  * indices → `slice` per chunk. No shuffle, no state; output rows carry the
  * parent id so downstream shuffles (dedup, packing) key on whatever they
  * need. Every document yields ≥ 1 chunk (an empty doc is one empty chunk),
  * so no documents silently disappear.
  */
object Chunking {

  /** Explode each document into chunks of `chunkWords` whitespace words.
    * Output: (id, chunk_idx, n_words, chunk_text).
    */
  def byWords(docs: DataFrame, id: Column, text: Column,
      chunkWords: Int): DataFrame = {
    val cw = lit(chunkWords.toLong)
    val words = split(TextAnalysis.normalize(text), " ")
    val nChunks = greatest(lit(1L),
      call_function("div", size(words) + (cw - 1L), cw))
    docs.select(id.as("id"), words.as("w"), nChunks.as("nc"))
      .select(col("id"), col("w"),
        posexplode(sequence(lit(0L), col("nc") - 1L)).as(Seq("pos", "ci")))
      .select(col("id"), col("ci").as("chunk_idx"),
        slice(col("w"), (col("ci") * cw + 1L).cast("int"), lit(chunkWords))
          .as("cw_arr"))
      .select(col("id"), col("chunk_idx"),
        size(col("cw_arr")).cast("long").as("n_words"),
        array_join(col("cw_arr"), " ").as("chunk_text"))
  }
}
