package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** `prod` aggregate — pandas groupby/reduction `prod`
  * (reference `legate/pandas/config.py:179-191` AggCode.PROD;
  * kernel `src/groupby/groupby_reduce.cc` product functor).
  *
  * Spark has no product aggregate; `exp(sum(log(x)))` is wrong for zeros
  * and negatives, so this is a tiny typed [[Aggregator]]. It is
  * partial-aggregatable (map-side combine happens before the shuffle), so
  * at 100 TB the shuffle carries one double per (partition, group) — the
  * same dataflow Spark uses for `sum`.
  *
  * pandas skipna semantics: nulls are skipped, empty/all-null group → 1.0.
  */
object ProdAgg extends Aggregator[java.lang.Double, Double, Double] {
  override def zero: Double = 1.0
  override def reduce(b: Double, a: java.lang.Double): Double =
    if (a == null || a.isNaN) b else b * a.doubleValue()
  override def merge(b1: Double, b2: Double): Double = b1 * b2
  override def finish(r: Double): Double = r
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `prod(col)` usable in `.agg(...)`. */
  def prod(c: Column): Column = udaf(ProdAgg).apply(c.cast("double"))
}
