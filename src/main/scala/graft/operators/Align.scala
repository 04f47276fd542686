package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Index-aligned frame combination — pandas `combine_first` and
  * `update` (reference exposes binary frame ops only through aligned
  * arithmetic; these are the NULL-preference aligned combinators from
  * the pandas surface, reference `frontend/dataframe.py` alignment
  * family).
  *
  * Shape: ONE shuffle each — a full-outer (combine_first) or left
  * (update) hash join on the index columns; every per-column rule is a
  * codegen'd `coalesce`/`when` projection on top.  No row-at-a-time
  * alignment, no driver participation, skew/broadcast handled by AQE
  * like any equi-join.
  */
object Align {

  /** pandas `self.combine_first(other)`: union of index labels; self's
    * non-null values win, other fills the holes (both missing rows and
    * null cells).  Column set = self's columns then other's extras, in
    * order.
    */
  def combineFirst(self: DataFrame, other: DataFrame, indexCols: Seq[String]): DataFrame = {
    require(indexCols.nonEmpty, "combine_first needs index columns")
    val sVals = self.columns.filterNot(indexCols.contains)
    val oVals = other.columns.filterNot(indexCols.contains)
    val joined = self.as("s").join(other.as("o"), indexCols, "full_outer")
    val vals = sVals.map { c =>
      if (oVals.contains(c)) coalesce(col(s"s.$c"), col(s"o.$c")).as(c)
      else col(s"s.$c").as(c)
    } ++ oVals.filterNot(sVals.contains).map(c => col(s"o.$c").as(c))
    joined.select(indexCols.map(col) ++ vals: _*)
  }

  /** pandas `self.update(other)`: self's shape and columns are kept;
    * for index labels present in both, other's NON-NULL values
    * overwrite self's (pandas never introduces rows or columns here).
    */
  def update(self: DataFrame, other: DataFrame, indexCols: Seq[String]): DataFrame = {
    require(indexCols.nonEmpty, "update needs index columns")
    val sVals = self.columns.filterNot(indexCols.contains)
    val shared = sVals.filter(other.columns.contains)
    val joined = self.as("s")
      .join(other.select((indexCols ++ shared).map(col): _*).as("o"),
        indexCols, "left")
    val vals = sVals.map { c =>
      if (shared.contains(c)) coalesce(col(s"o.$c"), col(s"s.$c")).as(c)
      else col(s"s.$c").as(c)
    }
    joined.select(indexCols.map(col) ++ vals: _*)
  }
}
