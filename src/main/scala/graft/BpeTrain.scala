package graft

import org.apache.spark.sql.functions._

/** Trains the checked-in BPE merges table (`graft/bpe_merges.txt`) — run
  * via `sbt "runMain graft.BpeTrain [sfDir] [outFile] [maxMerges]"`.
  *
  * Deterministic end to end: the word-frequency aggregation is exact
  * (one map-side-combined shuffle over pre-tokens — the only distributed
  * step, and the only one that scales with corpus size), and
  * [[graft.functions.BpeTrainer]] breaks every tie lexicographically.
  * Re-running over the same corpus reproduces the resource byte for byte
  * (minus the header comment), which is the provenance story for the
  * checked-in file. The format is GPT-2 `merges.txt` (one `left right`
  * per line, rank = order), so a published public vocabulary can replace
  * the trained one without code changes.
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("src/main/resources/graft/bpe_merges.txt")
    val maxMerges = args.lift(2).map(_.toInt).getOrElse(200)
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wordCounts = Tables.documents(spark, sfDir)
      .select(explode(expr(
        """regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"""))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val merges = graft.functions.BpeTrainer.train(wordCounts, maxMerges)
    val body = merges.map { case (l, r) => s"$l $r" }.mkString("\n")
    val header = s"#version: graft-bpe-1 (BpeTrain over $sfDir documents, " +
      s"maxMerges=$maxMerges, minFreq=2, deterministic ties)\n"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      header + body + "\n")
    println(s"BPE_TRAIN wrote ${merges.length} merges to $out")
    spark.stop()
  }
}
