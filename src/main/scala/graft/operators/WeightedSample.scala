package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling WITHOUT replacement at scale — the data-mixing
  * primitive a training pipeline uses to draw a fixed-size corpus where
  * each document's inclusion probability is proportional to its weight
  * (importance score, quality score, token count, …).
  *
  * Algorithm: Efraimidis–Spirakis A-ES.  Each row gets the key
  * `ln(u) / w` with `u ∈ (0,1)` uniform; the k rows with the LARGEST
  * keys are exactly a weighted sample without replacement.  On Spark
  * this is one scan to attach the key plus a `TakeOrderedAndProject`
  * top-k — per-partition bounded heaps, merge on the driver, NO global
  * sort and no shuffle of the losing rows.  At 100 TB: each executor
  * keeps a k-row heap; only ~k·numPartitions candidate rows move.
  *
  * Determinism (and hence the SQL oracle): `u` is not a PRNG draw but a
  * hash — the first 15 hex chars of `md5(salt ‖ id)` scaled by 16^15,
  * exactly reproducible in any engine with md5 (the same trick as the
  * restart-stable `sample(frac)`, GFrame.sample).  Same salt + same ids
  * → same sample, on any cluster size, in any engine.
  */
object WeightedSample {

  private val Space = math.pow(16.0, 15) // 60 bits — exact in a double

  /** The A-ES key column: ln(u)/w. Null/NaN/≤0-weight rows get -∞
    * as a belt — but [[take]]/[[takePerGroup]] FILTER them out first,
    * because -∞ still ranks (and would be emitted whenever k exceeds
    * the positive-weight population), violating "never sampled".
    * NaN needs its own check: Spark's nan-safe ordering treats NaN as
    * greater than everything, so a NaN weight passes `> 0` and would
    * otherwise yield a NaN key that sorts FIRST in the descending top-k.
    */
  def esKey(idExpr: Column, weight: Column, salt: String): Column = {
    val u = (conv(substring(md5(concat(lit(salt), idExpr.cast("string"))), 1, 15),
      16, 10).cast("double") + lit(0.5)) / lit(Space) // (0,1), never exactly 0
    val w = weight.cast("double")
    when(weight.isNull || isnan(w) || weight <= 0, lit(Double.NegativeInfinity))
      .otherwise(log(u) / w)
  }

  /** Rows eligible for sampling: non-null, non-NaN, strictly positive. */
  private def validWeight(weightCol: String): Column =
    col(weightCol).isNotNull && !isnan(col(weightCol).cast("double")) &&
      col(weightCol) > 0

  /** Top-k rows by the A-ES key (largest first).  The extra `__es`
    * column is dropped from the result; row set is the sample.
    */
  def take(df: DataFrame, idCol: String, weightCol: String, k: Int,
           salt: String = "es"): DataFrame = {
    val keyed = df.filter(validWeight(weightCol))
      .withColumn("__es", esKey(col(idCol), col(weightCol), salt))
    Sorts.topK(keyed, Seq("__es", idCol), Seq(false, true), k).drop("__es")
  }

  /** Stratified weighted sampling: k-per-group A-ES via the GroupTopK
    * physical operator — partial bounded heaps below the exchange, so
    * each group moves at most k·numPartitions candidate rows.  The
    * per-group analogue of [[take]]; same determinism contract.
    */
  def takePerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                   weightCol: String, k: Int, salt: String = "es"): DataFrame = {
    val keyed = df.filter(validWeight(weightCol))
      .withColumn("__es", esKey(col(idCol), col(weightCol), salt))
    graft.plans.GroupTopK.topKPerKey(
      keyed, groupCols, Seq("__es" -> true, idCol -> false), k).drop("__es")
  }
}

/** One candidate row in the streaming A-ES reservoir. */
final case class EsRow(key: Double, docId: Long, source: String, nChars: Long)

/** Bounded top-k-by-A-ES-key reservoir as a typed mergeable
  * [[Aggregator]] — the STREAMING form of weighted sampling without
  * replacement.  The buffer is the running sample (≤ k rows, sorted by
  * key desc / id asc); merge of two reservoirs is the top-k of their
  * union, so the result is microbatch-invariant and identical to the
  * batch [[WeightedSample.take]] on the same rows — one state row of
  * O(k) regardless of stream length.
  */
class EsReservoir(k: Int)
  extends org.apache.spark.sql.expressions.Aggregator[EsRow, Seq[EsRow], Seq[EsRow]] {

  private def better(a: EsRow, b: EsRow): Boolean =
    a.key > b.key || (a.key == b.key && a.docId < b.docId)

  override def zero: Seq[EsRow] = Seq.empty

  override def reduce(buf: Seq[EsRow], x: EsRow): Seq[EsRow] =
    merge(buf, Seq(x))

  override def merge(a: Seq[EsRow], b: Seq[EsRow]): Seq[EsRow] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[EsRow]): Seq[EsRow] = buf

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[EsRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[EsRow]]()

  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[EsRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[EsRow]]()
}
