package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import graft.functions.SqlFunctions

/** The graft_* SQL function surface: registered kernels must behave
  * exactly like their Scala DSL twins, and codegen-shaping parameters
  * must be rejected unless they are integer literals.
  */
class SqlFunctionsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  SqlFunctions.register(spark)

  test("SQL kernels equal their DSL twins") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox jumps over the lazy dog again"))
      .toDF("id", "t")
    docs.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_simhash64(t) AS sh,
              graft_word_shingles(t, 3) AS sg,
              graft_minhash_slots(graft_word_shingles(t, 2), 16) AS mh,
              graft_bpe_count(t) AS bc,
              graft_nfc_clean(t) AS nc,
              graft_bounded_levenshtein(t, upper(t), 50) AS lv
         FROM sqlfn_docs ORDER BY id""").collect()
    val viaDsl = docs.select(col("id"),
        graft.functions.SimhashFunctions.simhash64(col("t")).as("sh"),
        graft.functions.TextFunctions.wordShingles(col("t"), 3).as("sg"),
        graft.functions.MinhashFunctions.minhashSlots(
          graft.functions.TextFunctions.wordShingles(col("t"), 2), 16)
          .as("mh"),
        graft.functions.QualityFunctions.bpeCount(col("t")).as("bc"),
        graft.functions.NormalizeFunctions.nfcClean(col("t")).as("nc"),
        graft.functions.LevenshteinFunctions
          .boundedLevenshtein(col("t"), upper(col("t")), 50).as("lv"))
      .orderBy("id").collect()
    assert(viaSql.map(_.toSeq).toSeq === viaDsl.map(_.toSeq).toSeq)
  }

  test("pairwise SQL kernels: jaccard and cosine") {
    val r = spark.sql(
      """SELECT graft_sorted_jaccard(array(1L, 2L, 3L),
                                     array(1L, 2L, 4L)) AS j,
              graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c1,
              graft_cosine(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS c0""")
      .collect().head
    // {1,2,3} vs {1,2,4}: jaccard = 2/4
    assert(r.getDouble(0) === 0.5)
    assert(r.getDouble(1) === 1.0 && r.getDouble(2) === 0.0)
  }

  test("codegen-shaping parameters must be integer literals") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles('a b c', id + 1) " +
        "FROM range(3)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
    val a = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1.0F))").collect()
    }
    assert(a.getMessage.contains("expects 2 arguments"))
  }

  test("injectables cover every builder with unique names") {
    val inj = SqlFunctions.injectables
    assert(inj.map(_._1.funcName).distinct.size === SqlFunctions.builders.size)
    // builders construct the advertised expression classes
    val cos = SqlFunctions.builders.toMap.apply("graft_cosine")(
      Seq(Literal(1), Literal(2)))
    assert(cos.isInstanceOf[graft.functions.CosineSim])
  }
}
