package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{SpanDedup, TextAnalysis}

/** Study main (r19): formatted plans of the verbatim-dup DISPATCH PROBES,
  * before (exact countDistinct) and after (approx_count_distinct over
  * xxhash64 — VERDICT r18 task 5). The probes run EAGERLY at query
  * construction, so the registered queries' own explain output never
  * shows them — this tool materializes both probe shapes as standalone
  * plans so plans/r19 carries checkable evidence that the exact-distinct
  * exchange (which hauled the corpus TEXT for source_overlap/lm_score)
  * is gone from the probe. Usage:
  *   sbt "runMain graft.ProbePlans <sfDir> <outDir>"
  */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.builderFor("local[8]", 8, sfDir).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val docs = Tables.documents(spark, sfDir)
    // the span family probes the slim (doc_id, 128-bit content key) frame
    val members = docs
      .select(col("doc_id"), TextAnalysis.normalize(col("text")).as("nt"))
      .select(col("doc_id"),
        struct(xxhash64(col("nt")).as("g1"),
          xxhash64(lit(2L), col("nt")).as("g2")).as("gk"))
      .select(col("doc_id"), col("gk"))
    val shapes: Seq[(String, DataFrame)] = Seq(
      "span_dedup_probe_before" ->
        members.agg(count(lit(1)).as("n"), countDistinct(col("gk")).as("d")),
      "span_dedup_probe_after" ->
        members.agg(count(lit(1)).as("n"),
          approx_count_distinct(xxhash64(col("gk")),
            SpanDedup.probeRsd).as("d")),
      "source_overlap_probe_before" ->
        docs.agg(count(lit(1)).as("n"),
          countDistinct(col("source"), col("text")).as("d")),
      "source_overlap_probe_after" ->
        docs.agg(count(lit(1)).as("n"),
          approx_count_distinct(xxhash64(col("source"), col("text")),
            SpanDedup.probeRsd).as("d")),
      "lm_score_probe_before" ->
        docs.agg(count(lit(1)).as("n"), countDistinct(col("text")).as("d")),
      "lm_score_probe_after" ->
        docs.agg(count(lit(1)).as("n"),
          approx_count_distinct(xxhash64(col("text")),
            SpanDedup.probeRsd).as("d")),
      // the dedup text-group collapse dispatch (overTextGroups /
      // edgesOverTextGroups — dedup_stats, containment_stats, the
      // clusters family): BEFORE probed the exact distinct of the
      // md5-fingerprint key (a normalize+md5 pass + cache + distinct
      // exchange); AFTER probes raw (text, blk) through one xxhash64
      // scan + HLL merge
      "dedup_stats_probe_before" -> {
        val m = docs.select(TextAnalysis.fingerprint(col("text")).as("gk"))
        m.agg(count(lit(1)).as("n"), countDistinct(col("gk")).as("d"))
      },
      "dedup_stats_probe_after" ->
        docs.agg(count(lit(1)).as("n"),
          approx_count_distinct(xxhash64(col("text")),
            SpanDedup.probeRsd).as("d")),
      // the vector-group collapse dispatch (overVectorGroups /
      // lshCosineEdges — the embedding dedup family): BEFORE the exact
      // distinct's key was the EMBEDDING VECTOR itself, so the probe
      // exchange carried the full vectors; AFTER only HLL registers move
      "dedup_embedding_probe_before" -> {
        val v = Tables.embeddings(spark, sfDir)
          .select(col("vec_id").as("id"), col("embedding").as("v"))
        v.agg(count(lit(1)).as("n"), countDistinct(col("v")).as("d"))
      },
      "dedup_embedding_probe_after" -> {
        val v = Tables.embeddings(spark, sfDir)
          .select(col("vec_id").as("id"), col("embedding").as("v"))
        v.agg(count(lit(1)).as("n"),
          approx_count_distinct(xxhash64(col("v")),
            SpanDedup.probeRsd).as("d"))
      })
    shapes.foreach { case (name, df) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
