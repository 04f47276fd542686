package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale corpus pipelines: token
  * counting, quality scoring, language ID, fingerprinting.
  *
  * These extend the reference's string surface (SURVEY §2.8) with the
  * operations an LLM training-data pipeline runs over billions of
  * documents. Everything is a Catalyst expression — no UDFs — so the whole
  * feature-extraction stage stays in one codegen'd scan: at 100 TB this is
  * a single pass over the corpus with no shuffle at all.
  */
object TextStats {

  /** Whitespace tokens (single-space convention of the corpus). */
  def tokens(c: Column): Column = split(c, " ")

  def nTokens(c: Column): Column = size(tokens(c))

  def nChars(c: Column): Column = length(c)

  /** BPE-ish regex token count: alpha runs and digit runs count
    * separately (the usual pre-tokenizer split).
    */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+"), lit(0)))

  /** Mean token length in characters. */
  def avgTokenLen(c: Column): Column =
    length(regexp_replace(c, " ", "")).cast("double") / nTokens(c)

  /** Fraction of characters that are ASCII letters. */
  def alphaRatio(c: Column): Column =
    length(regexp_replace(c, "[^A-Za-z]", "")).cast("double") / length(c)

  /** Fraction of tokens that are stopwords (tiny embedded list). */
  val stopwords: Seq[String] = Seq("a", "an", "the", "and", "or", "of", "in", "to", "is")

  def stopwordRatio(c: Column): Column = {
    val sw = typedLit(stopwords)
    size(filter(tokens(c), t => array_contains(sw, t))).cast("double") / nTokens(c)
  }

  /** Composite quality score in [0,1]-ish: rewards mid-length tokens and
    * presence of stopwords, penalizes very short docs. Deterministic,
    * SQL-expressible (mirrored in the oracle).
    */
  def qualityScore(c: Column): Column =
    least(nTokens(c).cast("double") / 100.0, lit(1.0)) * 0.4 +
      stopwordRatio(c) * 0.3 +
      least(avgTokenLen(c) / 8.0, lit(1.0)) * 0.3

  /** Heuristic language ID: CJK script detection, then marker-token
    * votes; ties resolved by fixed priority. (A real pipeline swaps in a
    * fastText-style model via the same column-in/column-out shape.)
    */
  def langId(c: Column): Column = {
    def score(markers: Seq[String]): Column =
      markers.map(m => size(filter(tokens(c), t => t === m))).reduce(_ + _)
    val en = score(Seq("the", "and", "of"))
    val de = score(Seq("der", "und", "die"))
    val fr = score(Seq("le", "et", "les"))
    val es = score(Seq("el", "y", "los"))
    when(c.rlike("[一-鿿]"), "zh")
      .when(de > en && de > fr && de > es, "de")
      .when(fr > en && fr > de && fr > es, "fr")
      .when(es > en && es > de && es > fr, "es")
      .otherwise("en")
  }

  /** Document fingerprint: md5 of the whitespace-normalized lowercase
    * text — the exact-dedup key at corpus scale (hash-groupBy, one
    * shuffle of 16-byte keys instead of full documents).
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(trim(lower(c)), "\\s+", " "))
}
