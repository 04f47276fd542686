package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Missing-data handling: isna / notna / fillna / dropna
  * (reference `legate/pandas/frontend/frame.py:737-858`).
  *
  * pandas' missing sentinel for floats is NaN
  * (`legate/pandas/common/types.py:417-423`); Spark distinguishes NaN
  * from null, so isna/fillna/dropna here treat BOTH as missing for
  * floating columns — matching user-visible reference behavior.
  */
object NullOps {
  import PandasArith.isna

  /** fillna(value) on the given columns
    * (BROADCAST_FILLNA `src/transform/tasks/broadcast_fillna.cc:115`).
    */
  def fillna(df: DataFrame, values: Map[String, Column]): DataFrame =
    values.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, when(isna(col(c)), v).otherwise(col(c)))
    }

  /** dropna(how="any"/"all", thresh, subset)
    * (DROPNA `src/copy/tasks/dropna.cc:59` — thresh = minimum count of
    * non-null values over the subset; how="any" ⇔ thresh=|subset|,
    * how="all" ⇔ thresh=1).
    */
  def dropna(df: DataFrame, subset: Seq[String], thresh: Int): DataFrame = {
    val nonNullCount = subset
      .map(c => when(!isna(col(c)), 1).otherwise(0))
      .reduce(_ + _)
    df.filter(nonNullCount >= thresh)
  }

  def dropnaAny(df: DataFrame, subset: Seq[String]): DataFrame =
    dropna(df, subset, subset.size)

  def dropnaAll(df: DataFrame, subset: Seq[String]): DataFrame =
    dropna(df, subset, 1)

  /** Per-column missing count — isna().sum() in pandas. */
  def countNa(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      sum(when(isna(col(cols.head)), 1L).otherwise(0L)).as(s"${cols.head}_nulls"),
      cols.tail.map(c => sum(when(isna(col(c)), 1L).otherwise(0L)).as(s"${c}_nulls")): _*)
}
