package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Population Stability Index over fixed token-count buckets
  * (q447/q451): the recurring-crawl data-quality monitor. Laplace-
  * smoothed shares p,q = (c+1)/(n+B); each (p−q)·ln(p/q) term is
  * 6dp-rounded then DECIMAL-summed (q153 discipline), and buckets
  * empty on BOTH sides fold in arithmetically as (B−k) copies of the
  * all-empty smoothed term — exact, since DECIMAL addition of
  * identical grid terms commutes with the multiply. One corpus pass
  * per side; everything after the histogram aggs is |sources|×B-sized.
  */
object Psi {

  /** Token-count bucket of a `text` column: fixed-width 10-token
    * buckets with an open last bucket (scan-stage, shared by the batch
    * and streaming monitors).
    */
  def bucketCol(nBuckets: Int): org.apache.spark.sql.Column =
    least(floor(size(filter(split(col("text"), " "), x => x =!= ""))
      / 10).cast("long"), lit(nBuckets - 1L))

  /** (source, bucket, `cc`) histogram of token counts. */
  def hist(t: DataFrame, nBuckets: Int, cc: String): DataFrame = t
    .select(col("source"), bucketCol(nBuckets).as("bucket"))
    .groupBy("source", "bucket").agg(count(lit(1)).as(cc))

  /** PSI per source from two histograms (columns (source, bucket, cb)
    * and (source, bucket, cn)).
    */
  def fold(hb: DataFrame, hn: DataFrame, nBuckets: Int): DataFrame = {
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val j = hb.join(hn, Seq("source", "bucket"), "full_outer")
      .withColumn("nb", sum("cb").over(wSrc))
      .withColumn("nn", sum("cn").over(wSrc))
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
      .withColumn("cn", coalesce(col("cn"), lit(0L)))
    def share(c: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      (c + lit(1)).cast("double") / (n + lit(nBuckets.toLong)).cast("double")
    def term(cb: org.apache.spark.sql.Column, cn: org.apache.spark.sql.Column) = {
      val p = share(cb, col("nb"))
      val q = share(cn, col("nn"))
      Num.rnd((p - q) * log(p / q), 6).cast("decimal(18,6)")
    }
    j.groupBy("source")
      .agg(sum(term(col("cb"), col("cn"))).as("__present"),
        count(lit(1)).as("__k"),
        first(col("nb")).as("nb"), first(col("nn")).as("nn"))
      .select(col("source"),
        (col("__present") + (lit(nBuckets.toLong) - col("__k")) *
          term(lit(0L), lit(0L))).cast("double").as("psi"))
  }
}
