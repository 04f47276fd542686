package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ProdAgg

/** Groupby reductions — the reference's only groupby capability
  * (reference `legate/pandas/frontend/groupby.py:22-297`; agg set
  * `legate/pandas/config.py:179-191`:
  * sum,min,max,count,prod,mean,var,std,size,any,all).
  *
  * Spark mapping: `groupBy(keys).agg(...)` plans partial aggregation →
  * hash Exchange on the keys → final aggregation, which is exactly the
  * reference's HASH variant (`core/groupby.py:201-230`) with map-side
  * combine added for free. `EnsureRequirements` elides the Exchange when
  * the child is already partitioned by the keys — the analogue of the
  * reference's `is_partitioned_by` reuse check (`core/table.py:222-268`).
  *
  * At 100 TB: partial agg means the shuffle carries one row per
  * (input-partition, group); group count, not input size, bounds the
  * exchange. Skewed key distributions are handled by AQE skew handling,
  * already on in [[graft.GraftSession]].
  */
object GroupAgg {

  /** Resolve a pandas agg-spec name to a Spark aggregate Column.
    * Mirrors the frontend whitelist `frontend/reduction.py:27-39`.
    * ddof=1 (`var`/`std`) matches Spark's `var_samp`/`stddev_samp`.
    */
  def aggColumn(fn: String, c: Column): Column = fn match {
    case "sum"   => sum(c)
    case "min"   => min(c)
    case "max"   => max(c)
    case "count" => count(c)
    case "prod"  => ProdAgg.prod(c)
    case "mean"  => avg(c)
    case "var"   => var_samp(c)
    case "std"   => stddev_samp(c)
    case "size"  => count(lit(1))
    case "any"   => bool_or(c.cast("boolean"))
    case "all"   => bool_and(c.cast("boolean"))
    case other   => throw new IllegalArgumentException(s"unknown agg: $other")
  }

  /** pandas `df.groupby(keys).agg(col -> [fns])`. Multi-fn columns get
    * pandas-style flattened names `col_fn`
    * (MultiIndex columns, `frontend/groupby.py:200-219`).
    * Output is unsorted (reference README.md:190-192); pass sort=true for
    * the post-sort the reference applies with `sort=True`.
    */
  def agg(df: DataFrame, keys: Seq[String], spec: Seq[(String, Seq[String])],
          sort: Boolean = false): DataFrame = {
    val aggs = for ((c, fns) <- spec; fn <- fns)
      yield aggColumn(fn, col(c)).as(if (fns.size == 1 && spec.count(_._1 == c) == 1) s"${c}_$fn" else s"${c}_$fn")
    val out = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    if (sort) out.orderBy(keys.map(col): _*) else out
  }

  /** Global (whole-frame) reduction → single row
    * (reference `frontend/frame.py:340-594`, per-piece UNARY_REDUCTION +
    * future combine `src/reduction/tasks/unary_reduction.cc`).
    * In Spark this is `df.agg(...)` — partial + final aggregate, no
    * groupBy shuffle at all (single exchange to one reducer of one row
    * per partition).
    */
  def reduceAll(df: DataFrame, spec: Seq[(String, String)]): DataFrame = {
    val aggs = spec.map { case (c, fn) => aggColumn(fn, col(c)).as(s"${c}_$fn") }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
