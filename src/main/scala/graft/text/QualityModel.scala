package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Frozen LINEAR quality classifier over hashed bag-of-words features —
  * the deployment half of a fastText-style model (Joulin et al. 2017;
  * the shape GPT-3/CCNet used for model-based quality filtering).
  * Training happens offline; what a 100 TB pipeline ships is exactly
  * this: a constant weight table applied in one scan.
  *
  * Shape for scale: the model is a 64-bucket weight array literal
  * riding the closure; the margin is a pure scan-stage fold inside
  * whole-stage codegen (`aggregate` over the token array) — no join,
  * no shuffle, no UDF.  The reference has no model-scoring surface;
  * this extends the training-data toolkit beyond it.
  *
  * Margin = bias + (Σ_tokens w[bucket(tok)]) / n  — the mean hashed
  * feature weight, all IEEE-exact-rounded ops a SQL oracle replays
  * bit-for-bit (no sigmoid: exp() would pull in libm ulps, and the
  * keep decision only needs the margin's sign).  Empty documents score
  * exactly `bias`.
  */
object QualityModel {

  val Buckets = 64
  val Bias = -0.02

  /** Frozen weights, deterministic from the bucket id (stand-in for an
    * offline-trained model; the PIPELINE — hashing, fold, threshold —
    * is the real, tested artifact).  Values are exact binary doubles
    * whose decimal round-trip is identical in both engines.
    */
  val Weights: IndexedSeq[Double] =
    (0 until Buckets).map(b => ((b * 37 + 11) % 97) / 97.0 - 0.5)

  /** DuckDB list literal of the weights.  Each element goes through a
    * STRING→DOUBLE cast: a bare numeric literal with this many digits
    * parses as DECIMAL in DuckDB (overflowing the reduce), while the
    * string cast is a correctly-rounded double parse that round-trips
    * the exact binary value.
    */
  def weightsSql: String =
    Weights.map(w => s"CAST('$w' AS DOUBLE)").mkString("[", ", ", "]")

  private def tokens(text: Column): Column =
    graft.text.TextStats.tokensNonEmpty(text)

  /** md5 bucket, same cross-engine discipline as [[Dsir.bucket]]. */
  def bucket(w: Column): Column =
    conv(substring(md5(w), 1, 4), 16, 10).cast("int") % Buckets

  /** Classifier margin column (left fold from 0.0, ≡ list_reduce). */
  def margin(text: Column): Column = {
    val wArr = typedlit(Weights)
    val toks = tokens(text)
    val n = size(toks)
    when(n === 0, lit(Bias)).otherwise(
      aggregate(toks, lit(0.0),
        (acc, w) => acc + element_at(wArr, bucket(w) + 1)) / n + lit(Bias))
  }

  /** keep = margin strictly positive. */
  def keep(text: Column): Column = margin(text) > 0.0
}
