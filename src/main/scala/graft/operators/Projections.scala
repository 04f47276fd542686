package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row/column selection, masking and scatter-style assignment.
  *
  * Column selection is metadata-only in the reference
  * (`legate/pandas/core/table.py:156-214`) and a pruned projection here —
  * Catalyst's ColumnPruning pushes it into the parquet scan.
  *
  * Boolean-mask filtering (`df[mask]`) is the reference's COMPACT task
  * (`src/copy/tasks/compact.cc:61`) → `df.filter`, fused into the scan
  * stage by whole-stage codegen.
  *
  * Scatter assignment (`loc` assignment; reference SCATTER_BY_MASK
  * `src/copy/tasks/scatter_by_mask.cc:314`) is a branch-free
  * `when(mask, v).otherwise(col)` projection — no copy-on-write machinery
  * needed because DataFrames are immutable.
  */
object Projections {

  def select(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  def drop(df: DataFrame, cols: Seq[String]): DataFrame = df.drop(cols: _*)

  def filterMask(df: DataFrame, mask: Column): DataFrame = df.filter(mask)

  /** where/mask (`frontend/frame.py:218-275`, COPY_IF_ELSE task):
    * keep value where cond holds, else `other` (null when absent).
    */
  def where(df: DataFrame, cols: Seq[String], cond: Column,
            other: Option[Column] = None): DataFrame = {
    val oth = other.getOrElse(lit(null))
    cols.foldLeft(df)((d, c) => d.withColumn(c, when(cond, col(c)).otherwise(oth)))
  }

  /** loc-style scatter assignment: set `colName` = `value` where mask. */
  def scatter(df: DataFrame, colName: String, mask: Column, value: Column): DataFrame =
    df.withColumn(colName, when(mask, value).otherwise(col(colName)))

  /** insert/__setitem__ — add or replace a column (FILL task for scalar
    * broadcast, `src/copy/tasks/fill.cc:26`).
    */
  def withColumn(df: DataFrame, name: String, value: Column): DataFrame =
    df.withColumn(name, value)

  def rename(df: DataFrame, mapping: Map[String, String]): DataFrame =
    mapping.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  def addPrefix(df: DataFrame, prefix: String): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(prefix + _): _*)

  def addSuffix(df: DataFrame, suffix: String): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(_ + suffix): _*)

  /** head(n) over an explicit order — deterministic analogue of the
    * reference's SLICE_BY_RANGE positional head
    * (`src/copy/tasks/slice_by_range.cc:39`). Plans as
    * TakeOrderedAndProject (no global sort).
    */
  def headBy(df: DataFrame, order: Seq[Column], n: Int): DataFrame =
    df.orderBy(order: _*).limit(n)

  /** tail(n): same but reversed order. */
  def tailBy(df: DataFrame, order: Seq[Column], n: Int): DataFrame =
    df.orderBy(order.map(_.desc): _*).limit(n)
}
