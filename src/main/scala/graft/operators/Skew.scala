package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — the explicit-salting fallback for
  * cases AQE's runtime skew-join can't fix (e.g. a single key holding
  * >1 executor-memory of rows on BOTH sides).
  *
  * `saltedJoin(left, right, key, k)`: the left (large, skewed) side gets
  * a deterministic salt in [0,k) derived from a hash of its other
  * columns; the right side is replicated k times with every salt value.
  * The join key becomes (key, salt) — the hot key's rows spread over k
  * reducers. Deterministic (no rand()) so results are reproducible and
  * retries are safe — rand() salting breaks Spark task retry semantics.
  *
  * Cost: right side ×k (use only when right is much smaller), one
  * shuffle on (key, salt) instead of key.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int, how: String = "inner"): DataFrame = {
    val saltCols = left.columns.filterNot(_ == key).map(col)
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltCols.toIndexedSeq: _*), lit(saltBuckets)).cast("int"))
    val salts = right.sparkSession.range(saltBuckets.toLong)
      .select(col("id").cast("int").as("__salt"))
    val rSalted = right.crossJoin(broadcast(salts))
    l.join(rSalted, Seq(key, "__salt"), how).drop("__salt")
  }
}
