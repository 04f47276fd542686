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

  /** The A-ES key column: ln(u)/w, null-weight/≤0-weight rows excluded
    * by giving them -∞ (never sampled).
    */
  def esKey(idExpr: Column, weight: Column, salt: String): Column = {
    val u = (conv(substring(md5(concat(lit(salt), idExpr.cast("string"))), 1, 15),
      16, 10).cast("double") + lit(0.5)) / lit(Space) // (0,1), never exactly 0
    when(weight.isNull || weight <= 0, lit(Double.NegativeInfinity))
      .otherwise(log(u) / weight.cast("double"))
  }

  /** Top-k rows by the A-ES key (largest first).  The extra `__es`
    * column is dropped from the result; row set is the sample.
    */
  def take(df: DataFrame, idCol: String, weightCol: String, k: Int,
           salt: String = "es"): DataFrame = {
    val keyed = df.withColumn("__es", esKey(col(idCol), col(weightCol), salt))
    Sorts.topK(keyed, Seq("__es", idCol), Seq(false, true), k).drop("__es")
  }
}
