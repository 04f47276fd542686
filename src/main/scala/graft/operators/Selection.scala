package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed selection (discrete quantiles) by value-domain
  * bisection: O(log range) COUNT passes over a cached integer column.
  *
  * This is the bounded-memory EXACT path at scale — Spark's
  * `percentile` buffers every group value in the aggregation buffer
  * (fine at gigabytes, fatal at 100 TB), `approx_percentile` bounds
  * memory but is approximate, and q271's histogram sketch brackets
  * within a bucket width.  Bisection keeps exactness with O(1) state
  * per executor: each probe is one codegen'd `count(x <= mid)` scan of
  * the cached column, and the driver loop is bounded by the value
  * range (≤ 64 iterations for any long domain).
  *
  * Semantics match DuckDB's `quantile_disc`: the smallest element v
  * with count(x ≤ v) ≥ ceil(p·n).
  */
object Selection {

  /** @param values single numeric column expression, integer-valued
    * @return the exact discrete p-quantile of `values` in `df`
    */
  def quantileDisc(df: DataFrame, values: Column, p: Double): Long = {
    // nulls must not inflate n: count() over the projection counts rows
    // (nulls included) while every bisection probe and min/max exclude
    // them, which could make `rank` unreachable and silently return the
    // max. Filter first so n is the non-null count (DuckDB's
    // quantile_disc likewise ignores NULLs).
    val cached = df.select(values.cast("long").as("v"))
      .filter(col("v").isNotNull).cache()
    try {
      val n = cached.count()
      require(n > 0, "quantileDisc over an empty (or all-null) frame")
      val rank = math.max(1L, math.ceil(p * n).toLong)
      val bounds = cached.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        .collect()(0)
      var lo = bounds.getLong(0)
      var hi = bounds.getLong(1)
      while (lo < hi) {
        // avoid overflow on extreme domains
        val mid = lo + (hi - lo) / 2
        val c = cached.filter(col("v") <= mid).count()
        if (c >= rank) hi = mid else lo = mid + 1
      }
      lo
    } finally cached.unpersist()
  }
}
