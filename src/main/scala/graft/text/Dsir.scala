package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with hashed importance weights
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS'23): score each raw document by how much more
  * likely its hashed-token profile is under a TARGET domain's unigram
  * distribution than under the RAW corpus's.
  *
  * Shape for 100 TB:
  *   - the feature space is B hash buckets, NOT the vocabulary — the
  *     bucket statistics table is O(B) (64 here, 10^4 in the paper),
  *     computed with one explode+groupBy pass per side and collected to
  *     the driver like any other tiny dimension;
  *   - the per-document score is then a pure SCAN-stage fold: a map
  *     literal of B ratios rides the closure, and
  *     `aggregate(tokens, …)` sums the per-token ratios inside
  *     whole-stage codegen — no join, no shuffle for the scoring pass.
  *
  * Arithmetic: the paper scores with Σ log(p_target(b)/p_raw(b)); this
  * implementation uses the RATIO sum Σ p_t(b)/p_r(b) (same ordering for
  * ranking when distributions are close, and — like q118's rational
  * TF-IDF — every operation is an IEEE-exact-rounded mul/div/add that a
  * SQL oracle reproduces bit-for-bit; log would pull in libm ulp
  * differences).  Probabilities are add-1 smoothed over the B buckets.
  */
object Dsir {

  val Buckets = 64

  /** Hash bucket of a token: first 4 hex chars of md5 mod B — exactly
    * reproducible in DuckDB as `CAST('0x'||substr(md5(w),1,4) AS INT) % B`.
    */
  def bucket(word: Column): Column =
    conv(substring(md5(word), 1, 4), 16, 10).cast("int") % Buckets

  private def tokens(text: Column): Column =
    graft.text.TextStats.tokensNonEmpty(text)

  /** Per-bucket add-1-smoothed ratio table from a target/raw split:
    * ratio(b) = ((t_b+1) * (R+B)) / ((T+B) * (r_b+1)), with t/r the
    * bucket counts and T/R the totals.  All factors are integers exact
    * in doubles; the one division is IEEE-rounded — the oracle mirrors
    * the same expression shape.
    */
  def ratioTable(target: DataFrame, raw: DataFrame, textCol: String): Map[Int, Double] = {
    def counts(df: DataFrame): Map[Int, Long] =
      df.select(explode(tokens(col(textCol))).as("w"))
        .groupBy(bucket(col("w")).as("b")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val t = counts(target); val r = counts(raw)
    val tTot = t.values.sum.toDouble + Buckets
    val rTot = r.values.sum.toDouble + Buckets
    (0 until Buckets).map { b =>
      b -> ((t.getOrElse(b, 0L) + 1.0) * rTot) / (tTot * (r.getOrElse(b, 0L) + 1.0))
    }.toMap
  }

  /** Score column: left-to-right fold of the per-token bucket ratios
    * (the same association a DuckDB `list_reduce` applies, so the
    * oracle is bit-identical).  Empty token list → 0.
    */
  def score(text: Column, table: Map[Int, Double]): Column = {
    val m = typedlit(table)
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0.0), (acc, w) => acc + element_at(m, bucket(w))))
  }
}
