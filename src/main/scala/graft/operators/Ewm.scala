package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exponentially weighted mean per group — pandas
  * `groupby(...).ewm(alpha).mean()` with adjust=False, ignore_na=True:
  *
  *   y_0 = x_0;  y_t = (1-α)·y_{t-1} + α·x_t
  *
  * The recurrence is inherently sequential per group, so it runs as ONE
  * hash shuffle on the group keys + a partition-local sorted pass
  * (mapPartitions) carrying a single double of state per group — the
  * same executor-local shape as the reference's SCAN tasks. Null values
  * emit null and leave the state untouched (ignore_na).
  *
  * Not SQL-expressible without numerically explosive (1-α)^-t weight
  * sums, so verification is the driver-side fold in EwmSpec (rows-only
  * for the oracle gate).
  */
object Ewm {

  def ewmMean(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
              valueCol: String, alpha: Double, outCol: String): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    val sorted = df
      .repartition(groupCols.map(col): _*)
      .sortWithinPartitions((groupCols ++ orderCols).map(col): _*)
    val schema = sorted.schema.add(outCol, DoubleType, nullable = true)
    val gIdx = groupCols.map(sorted.schema.fieldIndex)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var state = 0.0
      var hasState = false
      it.map { r =>
        val key = gIdx.map(r.get)
        if (key != curKey) { curKey = key; hasState = false }
        val out: Any =
          if (r.isNullAt(vIdx)) null
          else {
            val x = r.getDouble(vIdx)
            state = if (hasState) (1 - alpha) * state + alpha * x else x
            hasState = true
            state
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(schema))
  }
}
