package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared discipline for iterative graph loops (PageRank family, HITS,
  * LPA): run the loop body with AQE disabled, scoped and restored.
  *
  * Why (opt guide §1.2 step 1 / §2.4): each iteration is a shape-pinned
  * pair of stages (shuffle-hash join on the cached edge layout + partial
  * agg) whose partition count the operator derives itself from the edge
  * count. AQE cannot improve that plan — the join strategy is hinted and
  * the edge layout must stay put for exchange reuse — but it charges a
  * driver re-planning round-trip per materialized shuffle stage. Measured
  * r13 (ProbeStages, q263 at sf0.1, best of 4): 4.67 s with AQE on, with
  * inter-stage gaps of 0.05-0.4 s after every one of ~16 tiny stages;
  * 2.83 s with AQE off, gaps gone, identical stage set and task times.
  * The same round-trips serialize on a busy cluster driver; an iterative
  * loop over a pinned layout is the one place they buy nothing.
  *
  * Scoped + restored so every non-iterative query keeps AQE (skew-join
  * splitting, partition coalescing). Deliberately NOT keyed on machine
  * size: the win is driver-latency per iteration, independent of scale.
  */
object Iterative {
  def withAqeOff[T](spark: SparkSession)(f: => T): T = {
    val k = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try f
    finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }
}
