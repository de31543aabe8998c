package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (SURVEY §2
  * L8-L11). All are pure `functions._` compositions — codegen'd, no UDFs —
  * and all arithmetic that reaches query output is either integer or an
  * int/int double division (IEEE-identical across engines, see SURVEY §6).
  */
object TextAnalysis {

  /** Whitespace tokens. Test documents are single-space separated; the regex
    * handles runs of whitespace for real-world text.
    */
  def tokens(text: Column): Column = split(text, "\\s+")

  def wordCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenization count: letter runs, digit runs, or single
    * non-space symbols (the usual GPT-2-style pre-tok shape, minus the
    * lookahead tricks regexp engines disagree on).
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  /** Counted by the one-pass [[graft.functions.BpeCountKernel]] — the
    * `regexp_extract_all` formulation materialized an array of every
    * match per row just to take its size; QualitySpec pins the kernel
    * against the regex on adversarial inputs, so the oracle fragment
    * (`len(regexp_extract_all(...))`) is unchanged.
    */
  def bpeTokenCount(text: Column): Column =
    graft.functions.QualityFunctions.bpeCount(text)

  /** A tiny, deterministic English-stopword set (present in the synthetic
    * vocab as well as real text).
    */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(lit(_)): _*)))

  /** Stopword ratio = stopwords / words (0.0 when empty). int/int double. */
  def stopwordRatio(text: Column): Column = {
    val n = wordCount(text)
    when(n === 0, lit(0.0))
      .otherwise(stopwordCount(text).cast("double") / n.cast("double"))
  }

  /** Punctuation density = punct chars / chars. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    val p = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    when(n === 0, lit(0.0)).otherwise(p.cast("double") / n.cast("double"))
  }

  /** Mean word length = non-space chars / words. */
  def meanWordLen(text: Column): Column = {
    val n = wordCount(text)
    val chars = length(regexp_replace(text, "\\s+", ""))
    when(n === 0, lit(0.0)).otherwise(chars.cast("double") / n.cast("double"))
  }

  /** Heuristic language ID via stopword evidence: one marker-word set per
    * language; predict the language with the most marker hits, "und" when no
    * evidence. Deterministic tie-break by probe order (en,de,fr,es).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "fr" -> Seq("le", "et", "les", "est"),
    "es" -> Seq("el", "y", "los", "es"))

  /** Marker counts come from the one-pass [[graft.functions
    * .TokenSetCountKernel]] (four `filter(tokens, isin(...))` passes →
    * one byte scan); the argmax chain is unchanged, so the DuckDB
    * `langExprSql` fragment keeps gating it.
    */
  def langId(text: Column): Column = {
    val counts = graft.functions.QualityFunctions.tokenSetCounts(
      text, langMarkers.map(_._2))
    val scores = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(counts, i + 1)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === best && best > 0, lit(lang)).otherwise(els)
    }
  }

  /** Quality score in [0,1]: rewards mid-length docs, penalizes punctuation
    * soup and stopword-free keyword stuffing. All terms are int/int doubles.
    *
    * Counts come from the one-pass native kernel
    * ([[graft.functions.QualityStatsKernel]]) instead of three regex
    * passes (split + a punctuation `regexp_extract_all` that materialized
    * an array per row + a stopword token filter) — the per-row scoring
    * floor of quality_bands / source_quota / the config curation
    * pipelines at scale. The kernel's counting contract is mirror-exact
    * with the regex formulation (QualitySpec pins them against each
    * other), so the DuckDB oracle fragment is unchanged.
    */
  def qualityScore(text: Column): Column = {
    val st = graft.functions.QualityFunctions.qualityStats(text)
    val nWords = element_at(st, 1)
    val words = nWords.cast("double")
    val lengthTerm = when(words >= 20 && words <= 1000, lit(1.0))
      .when(words < 20, words / lit(20.0))
      .otherwise(lit(1000.0) / words)
    val chars = element_at(st, 4)
    val pRatio = when(chars === 0, lit(0.0))
      .otherwise(element_at(st, 3).cast("double") / chars.cast("double"))
    val punctTerm = lit(1.0) - pRatio
    val sRatio = when(nWords === 0, lit(0.0))
      .otherwise(element_at(st, 2).cast("double") / nWords.cast("double"))
    val stopTerm = when(sRatio > 0.01, lit(1.0)).otherwise(lit(0.5))
    lengthTerm * punctTerm * stopTerm
  }

  /** Canonical normalization for fingerprinting/dedup: lowercase, strip
    * non-alphanumerics to spaces, collapse whitespace, trim.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), "\\s+", " "))

  /** Document fingerprint = md5 of the normalized text. Stands in for the
    * reference-free "rolling hash" fingerprint; md5 exists verbatim in both
    * Spark and DuckDB so the oracle can replay it.
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** PII redaction patterns (the C4/Dolma-style masking stage every
    * training-data pipeline runs before release). Deliberately
    * RE2-compatible — no backreferences or lookaround — so the exact same
    * pattern strings run in Java regex (Spark) and RE2 (DuckDB oracle),
    * and redaction is a pure narrow map (codegen'd, zero shuffle, scales
    * linearly to any corpus size).
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "IPV4" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "PHONE" -> "\\+?[0-9]{1,3}[- .]\\(?[0-9]{3}\\)?[- .][0-9]{3}[- .][0-9]{4}\\b")

  /** Replace every PII match with its `[TAG]`, applied in declaration order
    * (emails first, so an address is one `[EMAIL]`, not an `[EMAIL]` with a
    * phone-shaped tail).
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (tag, pat)) =>
      regexp_replace(c, pat, s"[$tag]")
    }

  /** Per-pattern match counts summed over the ORIGINAL text (audit metric:
    * how much PII a document carried, independent of redaction order).
    */
  def piiCount(text: Column): Column =
    piiPatterns.map { case (_, pat) =>
      size(regexp_extract_all(text, lit(pat), lit(0)))
    }.reduce(_ + _)
}
