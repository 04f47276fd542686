package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GLOBAL (ungrouped) shift / diff / pct_change — pandas
  * `df.col.shift(n)` over the whole frame in index order (reference
  * `legate/core` exposes these through the frame's global ordering;
  * the grouped variants live on GFrame.groupby).
  *
  * The naive plan — `lag(v, n) over (ORDER BY ...)` with no partition
  * key — funnels the entire dataset through ONE task. Instead the
  * global row number is assigned by [[Cumulative.globalRowNumberBy]]
  * (range shuffle + per-partition counts + local offset, all
  * distributed) and the shifted value arrives via a self equi-join on
  * `rn = rn − periods`: one hash shuffle on a long key, exact for any
  * period (positive = lag, negative = lead), no partition-boundary
  * carry cases.
  */
object ShiftGlobal {

  /** Append `outCol` = `valueCol` from the row `periods` earlier in
    * `orderCols` order (null where no such row). `orderCols` must be a
    * unique ordering for deterministic results.
    */
  def shift(df: DataFrame, orderCols: Seq[String], valueCol: String,
            periods: Int, outCol: String): DataFrame = {
    val rn = Cumulative.globalRowNumber(df, orderCols, "__sg_rn")
    val src = rn.select((col("__sg_rn") + periods).as("__sg_to"),
      col(valueCol).as(outCol))
    rn.join(src, col("__sg_rn") === col("__sg_to"), "left_outer")
      .drop("__sg_rn", "__sg_to")
  }

  /** value − value `periods` rows earlier (global pandas diff). */
  def diff(df: DataFrame, orderCols: Seq[String], valueCol: String,
           periods: Int, outCol: String): DataFrame =
    shift(df, orderCols, valueCol, periods, "__sg_prev")
      .withColumn(outCol, col(valueCol) - col("__sg_prev"))
      .drop("__sg_prev")

  /** Relative change vs `periods` rows earlier (global pct_change). */
  def pctChange(df: DataFrame, orderCols: Seq[String], valueCol: String,
                periods: Int, outCol: String): DataFrame =
    shift(df, orderCols, valueCol, periods, "__sg_prev")
      .withColumn(outCol,
        (col(valueCol) - col("__sg_prev")) / col("__sg_prev"))
      .drop("__sg_prev")
}
