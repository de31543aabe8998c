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

  test("fuzz: codegen kernel equals the rank-sequential reference on " +
      "adversarial UTF-8") {
    // the classes of input that can break the encode path: NULs in TEXT
    // (the rank-map key separator — must stay inert as data), lone and
    // paired surrogates, 4-byte codepoints glued to ASCII runs, digit
    // runs through the deep merge tree, and huge single words (worst-case
    // merge-loop length, far past any memo benefit within one row)
    val merges = BpeVocab.resourceMerges
    val pre = """[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]""".r
    def reference(t: String): Long =
      pre.findAllIn(t).map { m =>
        if (m.head < 128 && m.head.isLetterOrDigit)
          rankOrderCount(m, merges).toLong
        else 1L // one per non-run codepoint, whitespace dropped by `pre`
      }.sum

    val edges = Seq("", " ", "\u0000", "a\u0000b", "\u000B\u000C",
      "😀😀", "a😀b", "𝄞clef42", "42😀42", "\uD83D", "\uDE00",
      "😀", "\uDE00\uD83D", "Customer#000000042",
      "é中\u0000", "﻿00123", ("ab" + "\u0000" + "cd") * 3,
      "0" * 50000, "123456789" * 2000, "the" * 9000)
    val rnd = new scala.util.Random(23)
    val pool = Vector("the", "customer", "Customer", "000", "000000123",
      "42", "0", "99999", "#", "!", " ", "\t", "\u0000", "😀", "𝄞", "é",
      "中", "​", "\r\n", "a", "Z", "q")
    val fuzz = (0 until 1000).map { _ =>
      val n = rnd.nextInt(20)
      (0 until n).map(_ => pool(rnd.nextInt(pool.length)))
        .mkString(if (rnd.nextBoolean()) " " else "")
    }
    // through the DataFrame path, so doGenCode (not just nullSafeEval)
    // is what's being pinned
    val rows = (edges ++ fuzz).toDF("t")
      .select($"t", BpeFunctions.bpeTokenCount($"t").as("k")).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val show = t.take(24).flatMap(c =>
        if (c < ' ' || c >= 0xD800) f"\\u$c%04X" else s"$c")
      assert(r.getLong(1) === reference(t), s"text '$show' len=${t.length}")
    }
  }

  test("bpeEncode: ids decode back to text-minus-whitespace, length " +
      "equals bpeTokenCount, id ranges disjoint") {
    val merges = BpeVocab.resourceMerges
    // reverse map: id -> symbol string (codepoint below IdBase, else the
    // FIRST merge producing the id's rank — ids use min-rank, so the
    // rank's own l+r is the symbol)
    def symOf(id: Int): String =
      if (id < BpeEncodeKernel.IdBase) new String(Character.toChars(id))
      else { val (l, r) = merges(id - BpeEncodeKernel.IdBase); l + r }
    val ws = Set(' ', '\t', '\n', 0x0B.toChar, '\f', '\r')
    // corpus texts through the DataFrame path (doGenCode pinned), plus
    // the fuzz-edge shapes that stress the id scheme's codepoint branch
    val texts = Tables.documents(spark, sf).select($"text").as[String]
      .collect().toSeq ++ Seq("", "a😀b 42", "𝄞clef Customer#000000042")
    val rows = texts.toDF("t").select($"t",
      BpeFunctions.bpeEncode($"t").as("ids"),
      BpeFunctions.bpeTokenCount($"t").as("k")).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val ids = r.getSeq[Int](1)
      assert(ids.length.toLong === r.getLong(2),
        s"encode length != count for '${t.take(40)}'")
      assert(ids.map(symOf).mkString === t.filterNot(ws),
        s"decode round-trip failed for '${t.take(40)}'")
    }
    // merged-symbol ids start one past the last codepoint: disjoint ranges
    assert(BpeEncodeKernel.IdBase === Character.MAX_CODE_POINT + 1)
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
