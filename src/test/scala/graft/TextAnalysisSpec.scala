package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(text).toDF("text").select(c).head()

  test("word and BPE-ish token counting") {
    assert(one(TextAnalysis.wordCount($"text"), "a b  c").getInt(0) === 3)
    // letters run + digits run + 2 symbols + letters run = 5
    assert(one(TextAnalysis.bpeTokenCount($"text"), "ab12, (cd").getLong(0) === 5L)
  }

  test("normalize lowers, strips punctuation, collapses whitespace") {
    assert(one(TextAnalysis.normalize($"text"), " Hello,  WORLD!! ")
      .getString(0) === "hello world")
  }

  test("stopword and punct ratios are int/int doubles") {
    val r = Seq("the cat, the hat").toDF("text").select(
      TextAnalysis.stopwordRatio($"text").as("s"),
      TextAnalysis.punctRatio($"text").as("p")).head()
    assert(r.getDouble(0) === 2.0 / 4.0)
    assert(r.getDouble(1) === 1.0 / 16.0)
  }

  test("langId picks the language with most marker hits, und when none") {
    val df = Seq(
      ("the size of the house is big", "en"),
      ("der hund und die katze ist da", "de"),
      ("le chat et les chiens est la", "fr"),
      ("el perro y los gatos es aqui", "es"),
      ("zzz qqq www", "und"),
    ).toDF("text", "want")
    df.select(TextAnalysis.langId($"text").as("got"), $"want").collect()
      .foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("qualityScore in [0,1], rewards normal prose over symbol soup") {
    val scores = Seq(
      "the cat sat on the mat and then the dog sat on the cat so everyone sat down today",
      "!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@ !!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@",
    ).toDF("text").select(TextAnalysis.qualityScore($"text")).collect()
      .map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("fingerprint is normalization-invariant") {
    val fp = Seq("The  Quick FOX!", "the quick fox").toDF("text")
      .select(TextAnalysis.fingerprint($"text")).collect().map(_.getString(0))
    assert(fp(0) === fp(1))
  }

  test("domainMixture: sqrt-temperature weights match the naive truth, " +
      "normalize to 1, and oversample the tail") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
    // split limit -1 keeps trailing empty tokens — the semantics of
    // Spark's split and DuckDB's string_split_regex; Java's default
    // limit 0 drops them and would diverge on trailing whitespace
    val per = rows.groupBy(_.getString(0)).map { case (src, xs) =>
      src -> ((xs.length.toLong,
        xs.map(_.getString(1).split("\\s+", -1).length.toLong).sum))
    }
    val tot = per.values.map(_._2).sum
    val q = per.map { case (src, (_, t)) =>
      src -> math.floor(1048576.0 *
        math.sqrt(t.toDouble / tot.toDouble)).toLong
    }
    val qtot = q.values.sum
    val got = Queries.domainMixture(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq === per.keys.toSeq.sorted)
    got.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) === per(src)._1, s"n_docs of $src")
      assert(r.getLong(2) === per(src)._2, s"n_tokens of $src")
      assert(r.getDouble(3) === per(src)._2.toDouble / tot.toDouble)
      assert(r.getDouble(4) === q(src).toDouble / qtot.toDouble)
      assert(r.getDouble(5) === r.getDouble(4) / r.getDouble(3))
    }
    // weights normalize (exactly q/qtot summed — tiny float tail only)
    assert(math.abs(got.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    // α = 1/2 smooths toward uniform: the token-heaviest source is
    // undersampled (multiplier < 1), the lightest oversampled (> 1),
    // provided the corpus isn't already uniform
    val bySh = got.sortBy(_.getDouble(3))
    if (bySh.last.getDouble(3) > bySh.head.getDouble(3) * 1.01) {
      assert(bySh.last.getDouble(5) < 1.0)
      assert(bySh.head.getDouble(5) > 1.0)
    }
  }

  test("lmScore equals the naive conditional-probability truth over " +
      "the corpus; sub-2-word docs excluded; probabilities normalize") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").collect()
    def norm(t: String) =
      t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
    val words = rows.map(r =>
      r.getLong(0) -> norm(r.getString(1)).split(" ", -1).toSeq).toMap
    val inst = words.toSeq.flatMap { case (d, w) =>
      if (w.length < 2) Nil
      else w.sliding(2).map(p => (d, p(0), p(1))).toSeq
    }
    val c2 = inst.groupBy(i => (i._2, i._3))
      .map { case (k, v) => k -> v.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (x, m) => x -> m.values.sum }
    val q = c2.map { case ((x, y), c) =>
      (x, y) -> math.floor(1048576.0 * (c.toDouble / c1(x).toDouble)).toLong
    }
    val want = inst.groupBy(_._1).map { case (d, xs) =>
      val sq = xs.map(i => q((i._2, i._3))).sum
      d -> ((xs.size.toLong, sq.toDouble / xs.size / 1048576.0))
    }
    val got = Queries.lmScore(spark, sf).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) === want(d)._1, s"n_bigrams of doc $d")
      assert(r.getDouble(2) === want(d)._2, s"lm_score of doc $d")
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("lmScore collapsed path equals the naive truth on a verbatim-" +
      "duplicated corpus (gsize-weighted counts, members rejoined)") {
    import spark.implicits._
    // amplify the fixture: every doc appears twice more under new ids
    // (duplication factor 3 ≥ the dispatch's ≥2 bar), so the dispatch
    // takes the r18 collapse branch; the naive truth runs over the SAME
    // rows
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rows = base ++ base.flatMap { case (d, t) =>
      Seq((d + 1000000L, t), (d + 2000000L, t)) }
    val dir = java.nio.file.Files.createTempDirectory("graft_lmdup_")
    try {
      // lmScore reads documents(dir) — source/lang are unused by it but
      // the reader selects them, so carry placeholders
      rows.toSeq.toDF("doc_id", "text")
        .withColumn("source", lit("s")).withColumn("lang", lit("en"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      def norm(t: String) =
        t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      val inst = rows.toSeq.flatMap { case (d, t) =>
        val w = norm(t).split(" ", -1).toSeq
        if (w.length < 2) Nil
        else w.sliding(2).map(p => (d, p(0), p(1))).toSeq
      }
      val c2 = inst.groupBy(i => (i._2, i._3))
        .map { case (k, v) => k -> v.size.toLong }
      val c1 = c2.groupBy(_._1._1).map { case (x, m) => x -> m.values.sum }
      val q = c2.map { case ((x, y), c) =>
        (x, y) -> math.floor(1048576.0 * (c.toDouble / c1(x).toDouble)).toLong
      }
      val want = inst.groupBy(_._1).map { case (d, xs) =>
        val sq = xs.map(i => q((i._2, i._3))).sum
        d -> ((xs.size.toLong, sq.toDouble / xs.size / 1048576.0))
      }
      val got = Queries.lmScore(spark, dir.toString).collect()
      assert(got.length === want.size)
      got.foreach { r =>
        val d = r.getLong(0)
        assert(r.getLong(1) === want(d)._1, s"n_bigrams of doc $d")
        assert(r.getDouble(2) === want(d)._2, s"lm_score of doc $d")
      }
      // replicas carry exactly their original's row
      base.foreach { case (d, _) =>
        val byId = got.map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2)))).toMap
        for (rep <- Seq(d + 1000000L, d + 2000000L) if byId.contains(d))
          assert(byId(rep) === byId(d), s"replica $rep of doc $d")
      }
    } finally Queries.rmTree(dir.toFile)
  }

  test("redactPii masks emails, IPv4s, and phone numbers; counts match") {
    val text = "mail a.b+c@ex-1.org or admin@x.io, host 192.168.0.1, " +
      "call +1 555-012-3456; clean text stays."
    assert(one(TextAnalysis.redactPii($"text"), text).getString(0) ===
      "mail [EMAIL] or [EMAIL], host [IPV4], call [PHONE]; clean text stays.")
    assert(one(TextAnalysis.piiCount($"text"), text).getInt(0) === 4)
    // no PII → identity, zero count
    val clean = "version 1.2 costs 3 dollars at 5pm"
    assert(one(TextAnalysis.redactPii($"text"), clean).getString(0) === clean)
    assert(one(TextAnalysis.piiCount($"text"), clean).getInt(0) === 0)
  }
}
