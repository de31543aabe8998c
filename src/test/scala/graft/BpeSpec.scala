package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{BpeEncodeKernel, BpeFunctions, BpeTrainer, BpeVocab}

/** Real-vocab BPE: merges parsing, encoder semantics, trainer determinism,
  * and the checked-in resource's provenance (re-training over the same
  * corpus reproduces it exactly).
  */
class BpeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("parseMerges: GPT-2 format — headers and blanks skipped, rank = order") {
    val lines = Iterator("#version: 0.2", "", "t h", "th e", "  ", "e r")
    val m = BpeVocab.parseMerges(lines)
    assert(m.toSeq === Seq(("t", "h"), ("th", "e"), ("e", "r")))
    assertThrows[IllegalArgumentException](
      BpeVocab.parseMerges(Iterator("noseparator")).toSeq)
  }

  test("encodeCount: min-rank loop on a hand-checked example") {
    // merges: (l,o)→lo rank0, (lo,w)→low rank1, (e,r)→er rank2
    val ranks = BpeVocab.ranksOf(Array(("l", "o"), ("lo", "w"), ("e", "r")))
    assert(BpeEncodeKernel.encodeCount("low", ranks) === 1)   // l o w → lo w → low
    assert(BpeEncodeKernel.encodeCount("lower", ranks) === 2) // low + er
    assert(BpeEncodeKernel.encodeCount("wool", ranks) === 4)  // w o o l: no (l,o) adjacency, nothing merges
    assert(BpeEncodeKernel.encodeCount("x", ranks) === 1)
    assert(BpeEncodeKernel.encodeCount("", ranks) === 0)
    // left-to-right non-overlap: "aaa" under (a,a) → [aa, a]
    val aa = BpeVocab.ranksOf(Array(("a", "a")))
    assert(BpeEncodeKernel.encodeCount("aaa", aa) === 2)
    assert(BpeEncodeKernel.encodeCount("aaaa", aa) === 2) // [aa][aa]; (aa,aa) unranked
  }

  /** Independent slow reference: apply merges strictly in rank order.
    * Trained ranks make this equivalent to the kernel's min-rank loop
    * (a merge's sides always form at strictly lower ranks) — asserting
    * corpus-wide equality here is what licenses the oracle's
    * rank-sequential recursive-CTE replay.
    */
  private def rankOrderCount(word: String,
      merges: Array[(String, String)]): Int = {
    var syms = word.map(_.toString).toList
    for ((l, r) <- merges) {
      val out = scala.collection.mutable.ListBuffer[String]()
      var rest = syms
      while (rest.nonEmpty) rest match {
        case a :: b :: t if a == l && b == r => out += (l + r); rest = t
        case a :: t => out += a; rest = t
        case Nil => ()
      }
      syms = out.toList
    }
    syms.length
  }

  test("kernel equals the rank-sequential reference on every corpus word") {
    val merges = BpeVocab.resourceMerges
    val ranks = BpeVocab.ranksOf(merges)
    // document words exercise the letter merges; customer names (9-digit
    // zero-padded runs) exercise the vocabulary's deep digit merge tree
    val words = (Tables.documents(spark, sf)
      .select(explode(expr(
        """regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"""))
        .as("w"))
      unionAll Tables.customer(spark, sf)
      .select(explode(expr(
        """regexp_extract_all(c_name, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"""))
        .as("w")))
      .distinct().collect().map(_.getString(0))
    assert(words.length > 100)
    words.foreach { w =>
      assert(BpeEncodeKernel.encodeCount(w, ranks) === rankOrderCount(w, merges),
        s"word '$w'")
    }
  }

  test("trainer: deterministic, and the checked-in resource reproduces") {
    // greedy training is prefix-stable in maxMerges: the first 200 merges
    // of the checked-in 1910-merge table must equal a fresh 200-merge run
    // over the SAME corpus surface (full 1910-merge reproduction is
    // BpeTrain's one-off job; the prefix pins provenance at spec cost)
    val wordCounts = BpeTrain.corpusWordCounts(spark, "/root/testdata/sf0.1")
    val t1 = BpeTrainer.train(wordCounts, 200)
    val t2 = BpeTrainer.train(scala.util.Random.shuffle(wordCounts.toList), 200)
    assert(t1 === t2) // input order never leaks into the merges
    assert(t1.toArray.toSeq === BpeVocab.resourceMerges.toSeq.take(200),
      "checked-in graft/bpe_merges.txt no longer matches BpeTrain over sf0.1")
    assert(BpeVocab.resourceMerges.length > 1500,
      "production-shape vocabulary expected (~1.9k merges)")
  }

  test("corpus bounds: pretokens <= bpe tokens <= chars, and merging bites") {
    val df = Queries.textBpeTokens(spark, sf)
    val r = df.agg(sum($"n_pretokens"), sum($"n_bpe_tokens")).head()
    val (pre, bpe) = (r.getLong(0), r.getLong(1))
    assert(pre <= bpe) // each pre-token is >= 1 BPE token
    // the vocabulary compresses: strictly fewer tokens than characters
    val chars = Tables.documents(spark, sf)
      .agg(sum(length(regexp_replace($"text", "\\s", "")))).head().getLong(0)
    assert(bpe < chars)
  }
}
