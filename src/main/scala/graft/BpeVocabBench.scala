package graft

import org.apache.spark.sql.functions._

/** Measures the per-row cost of real-vocab BPE token counting as the
  * vocabulary grows: the checked-in production-shape table (~1.9k merges)
  * vs its first-89-merge prefix (the r10 table's size) over the two
  * corpus surfaces — document bodies (letter merges, near-total memo
  * hits) and customer names (9-digit runs through the deep digit merge
  * tree). The BASELINE.md "BPE encode cost vs vocab size" rows.
  *
  * The word memo makes steady-state cost per row O(pre-tokens) hash
  * lookups regardless of vocabulary size — the vocabulary only prices
  * the FIRST encode of each distinct word — so the big-vocab pass should
  * track the small-vocab pass within noise. The implied memo hit rate
  * (1 − distinct/total pre-tokens, exact while distinct words stay under
  * the 65536 cache cap) is printed alongside.
  *
  *   sbt "runMain graft.BpeVocabBench [sfDir] [reps]"
  */
object BpeVocabBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val full = graft.functions.BpeVocab.resourceMerges
    val small = full.take(89)
    val docs = Tables.documents(spark, dir).select(col("text"))
    val names = Tables.customer(spark, dir).select(col("c_name").as("text"))

    def stats(name: String,
        df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = df.select(
        count(lit(1)).as("rows"),
        sum(graft.functions.QualityFunctions.bpeCount(col("text")))
          .as("pretokens")).head()
      val distinct = df.select(explode(expr(
        """regexp_extract_all(text, '[A-Za-z]+|[0-9]+', 0)""")).as("w"))
        .distinct().count()
      (r.getLong(0), r.getLong(1), distinct)
    }
    def timedSum(df: org.apache.spark.sql.DataFrame,
        merges: Array[(String, String)]): (Double, Long) = {
      // fresh expression per pass = fresh (empty) memo: each timed pass
      // pays the full first-encode cost, not a prior pass's warm cache
      var out = 0L
      val secs = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        out = df.select(sum(graft.functions.BpeFunctions
          .bpeTokenCount(col("text"), merges)).as("t")).head().getLong(0)
        (System.nanoTime() - t0) / 1e9
      }.min
      (secs, out)
    }
    val parts = Seq("documents" -> docs, "names" -> names).map {
      case (label, df) =>
        df.cache().count()
        val (rows, pretokens, distinct) = stats(label, df)
        val (bigSec, bigToks) = timedSum(df, full)
        val (smallSec, smallToks) = timedSum(df, small)
        df.unpersist()
        val hitRate = 1.0 - distinct.toDouble / pretokens.toDouble
        s""""$label":{"rows":$rows,"pretokens":$pretokens,""" +
          s""""distinct_words":$distinct,"memo_hit_rate":${Bench.jnum(hitRate, 4)},""" +
          s""""big_vocab_sec":${Bench.jnum(bigSec)},"big_vocab_tokens":$bigToks,""" +
          s""""small_vocab_sec":${Bench.jnum(smallSec)},"small_vocab_tokens":$smallToks}"""
    }
    println(s"""{"metric":"bpe_vocab_cost","merges_big":${full.length},""" +
      s""""merges_small":${small.length},"reps":$reps,""" +
      parts.mkString(",") + s""","sf":"$dir"}""")
    spark.stop()
  }
}
