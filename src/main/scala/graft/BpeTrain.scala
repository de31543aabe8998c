package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trains the checked-in BPE merges table (`graft/bpe_merges.txt`) — run
  * via `sbt "runMain graft.BpeTrain [sfDir] [outFile] [maxMerges]"`.
  *
  * The training corpus is the full text surface of the testdata, not just
  * `documents.text`: document bodies, customer/supplier names (9-digit
  * zero-padded id runs — the digit-heavy material real web corpora are
  * full of, and what gives the vocabulary its deep digit-pair merge
  * tree), part name/brand/type, and the `events.props` JSON. At sf0.1
  * that is ~1.1M pre-tokens over ~15k distinct words and saturates at
  * ~1.9k merges under minFreq=2 — a production-shape table, where the
  * r10 table (sf0.01 documents only) saturated at 89.
  *
  * Deterministic end to end: the word-frequency aggregation is exact
  * (one map-side-combined shuffle over pre-tokens — the only distributed
  * step, and the only one that scales with corpus size), and
  * [[graft.functions.BpeTrainer]] breaks every tie lexicographically.
  * Re-running over the same corpus reproduces the resource byte for byte
  * (minus the header comment); BpeSpec pins the first 200 merges by
  * retraining (greedy training is prefix-stable in maxMerges). The format
  * is GPT-2 `merges.txt` (one `left right` per line, rank = order), so a
  * published public vocabulary can replace the trained one without code
  * changes.
  */
object BpeTrain {

  private val PretokenRe = """[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"""

  /** Exact (word, count) table over the corpus text surface — the one
    * distributed step of training, shared with BpeSpec's reproducibility
    * check. Union of per-table text columns → pre-token explode → one
    * map-side-combined count agg; only the vocabulary-sized result is
    * collected.
    */
  def corpusWordCounts(spark: SparkSession, sfDir: String): Seq[(String, Long)] = {
    def toks(df: DataFrame, colExpr: String): DataFrame =
      df.select(explode(expr(
        s"""regexp_extract_all($colExpr, '$PretokenRe', 0)""")).as("w"))
    val surface = Seq(
      toks(Tables.documents(spark, sfDir), "text"),
      toks(Tables.customer(spark, sfDir), "c_name"),
      toks(Tables.supplier(spark, sfDir), "s_name"),
      toks(Tables.part(spark, sfDir),
        "concat_ws(' ', p_name, p_brand, p_type)"),
      toks(Tables.events(spark, sfDir), "props")
    ).reduce(_.unionAll(_))
    surface.groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("src/main/resources/graft/bpe_merges.txt")
    val maxMerges = args.lift(2).map(_.toInt).getOrElse(4000)
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wordCounts = corpusWordCounts(spark, sfDir)
    val merges = graft.functions.BpeTrainer.train(wordCounts, maxMerges)
    val body = merges.map { case (l, r) => s"$l $r" }.mkString("\n")
    val header = s"#version: graft-bpe-2 (BpeTrain over $sfDir documents+" +
      s"customer+supplier+part+events text surface, maxMerges=$maxMerges, " +
      "minFreq=2, deterministic ties)\n"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      header + body + "\n")
    println(s"BPE_TRAIN wrote ${merges.length} merges to $out")
    spark.stop()
  }
}
