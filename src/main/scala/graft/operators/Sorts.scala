package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `sort_values` / `sort_index` / top-k.
  *
  * The reference's sort pipeline — local sort → sample keys → splitter
  * histogram → range shuffle → local merge
  * (reference `legate/pandas/core/sort.py:93-236`,
  * `src/sorting/tasks/sample_keys.cc`, `build_histogram.cc`) — is exactly
  * Spark's `RangePartitioner` under `orderBy`, so `sort_values` is a plain
  * `orderBy` with per-key direction and null placement.
  *
  * `na_position` maps to `asc_nulls_first/last`; pandas default is
  * nulls last for ascending (like Spark's `asc_nulls_last`? No — Spark asc
  * default is nulls FIRST, pandas default is nulls LAST, so we always set
  * placement explicitly).
  *
  * Top-k (`nlargest`-style) compiles to TakeOrderedAndProject — no global
  * sort materialization; at 100 TB each partition keeps k rows, the driver
  * merges. Verify with `.explain`.
  */
object Sorts {

  def sortCol(name: String, ascending: Boolean, naLast: Boolean = true): Column = {
    val c = col(name)
    (ascending, naLast) match {
      case (true, true)   => c.asc_nulls_last
      case (true, false)  => c.asc_nulls_first
      case (false, true)  => c.desc_nulls_last
      case (false, false) => c.desc_nulls_first
    }
  }

  /** pandas sort_values(by, ascending, na_position).
    * (`frontend/frame.py:881-924`)
    */
  def sortValues(df: DataFrame, by: Seq[String],
                 ascending: Seq[Boolean] = Seq(),
                 naLast: Boolean = true): DataFrame = {
    val asc = if (ascending.isEmpty) Seq.fill(by.size)(true) else ascending
    df.orderBy(by.zip(asc).map { case (c, a) => sortCol(c, a, naLast) }: _*)
  }

  /** Top-k by sort keys — plans as TakeOrderedAndProject (partition-local
    * top-k + driver merge; no full shuffle).
    */
  def topK(df: DataFrame, by: Seq[String], ascending: Seq[Boolean], k: Int): DataFrame =
    sortValues(df, by, ascending).limit(k)
}
