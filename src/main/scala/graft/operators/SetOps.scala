package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concatenation, dedup, and set operations.
  *
  * `concat(axis=0)` in the reference is UNION semantics, not ordered
  * concatenation (reference README.md:194-196; `core/table.py:365-476`)
  * → `unionByName`, which is a zero-shuffle narrow op in Spark.
  *
  * `drop_duplicates(subset, keep)` (reference
  * `frontend/dataframe.py:931-953`, tree reduction
  * `core/drop_duplicates.py:24-94`): Spark's `dropDuplicates` covers
  * keep-any; deterministic keep=first/last needs an explicit order column
  * (the reference itself is order-non-deterministic here) and is a
  * `row_number` window over the subset keys — a single shuffle on the
  * subset, same cost class as the reference's tree.
  */
object SetOps {

  /** concat(axis=0) — union semantics (README.md:194-196). */
  def concatRows(dfs: Seq[DataFrame]): DataFrame =
    // pandas concat(axis=0) takes the OUTER union of columns — a frame
    // missing a column contributes nulls there (r11; previously threw
    // on misaligned inputs, which pandas only does with join="inner")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** drop_duplicates(subset, keep="any") — hash-agg distinct on subset.
    * For full-row dedup pass subset = all columns.
    */
  def dropDuplicates(df: DataFrame, subset: Seq[String]): DataFrame =
    df.dropDuplicates(subset)

  /** keep="first"/"last" with a deterministic order column: one row per
    * subset-key group, the one minimizing (first) or maximizing (last)
    * the order columns. Single shuffle on subset keys.
    */
  def dropDuplicatesKeep(df: DataFrame, subset: Seq[String],
                         orderCols: Seq[String], keepFirst: Boolean): DataFrame = {
    val ord = orderCols.map(c => if (keepFirst) col(c).asc else col(c).desc)
    val w = Window.partitionBy(subset.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** keep=False — drop ALL rows that have any duplicate on the subset
    * (`frontend/dataframe.py:931-953` keep=False). Window count over the
    * subset keys, then filter: one shuffle, no join.
    */
  def dropDuplicatesKeepNone(df: DataFrame, subset: Seq[String]): DataFrame = {
    val w = Window.partitionBy(subset.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") === 1).drop("__n")
  }

  /** Set intersection/difference on whole rows — beyond the reference
    * (it has none, SURVEY §2.7), free in Spark.
    */
  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def except(a: DataFrame, b: DataFrame): DataFrame = a.except(b)
}
