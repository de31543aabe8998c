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
            SpanDedup.probeRsd).as("d")))
    shapes.foreach { case (name, df) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
