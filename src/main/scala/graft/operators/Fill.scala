package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** pandas `fillna(method="ffill"/"bfill")` — forward/backward
  * propagation of the last/next observed value.
  *
  * Grouped form: one partitioned window per group key (the usual
  * time-series shape, scale-safe when groups fit a partition's worth of
  * rows — same contract as every grouped window here).
  *
  * GLOBAL form: the naive `Window.orderBy(...)` funnel is replaced by
  * the two-phase carry shape of [[Cumulative.globalScan]] — range
  * shuffle, ONE aggregated value per partition to the driver (the
  * latest non-null, computed order-independently with `max_by` over the
  * ordering key), "last non-null wins" exclusive prefix as each
  * partition's carry-in, then a partition-local last-non-null window
  * coalesced with the carry literal. O(numPartitions) driver state.
  */
object Fill {

  /** Per-group forward fill of `valueCols` in `orderCols` order. */
  def ffillGrouped(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
                   valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Per-group backward fill. */
  def bfillGrouped(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
                   valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
  }

  /** pandas `interpolate(method="linear")` per group: null runs between
    * two observations get the linear blend by ROW position, leading
    * nulls stay null, trailing nulls carry the last observation. One
    * partitioned window set (q179's oracle mirrors the blend
    * arithmetic operation-for-operation).
    */
  def interpolateGrouped(df: DataFrame, groupCols: Seq[String],
                         orderCols: Seq[String], valueCol: String,
                         outCol: String): DataFrame = {
    val wAll = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val wPrec = wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFoll = wAll.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    df.withColumn("__pos", row_number().over(wAll))
      .withColumn("__pv", last(v, ignoreNulls = true).over(wPrec))
      .withColumn("__pp", last(when(v.isNotNull, col("__pos")),
        ignoreNulls = true).over(wPrec))
      .withColumn("__nv", first(v, ignoreNulls = true).over(wFoll))
      .withColumn("__np", first(when(v.isNotNull, col("__pos")),
        ignoreNulls = true).over(wFoll))
      .withColumn(outCol,
        when(v.isNotNull, v)
          .otherwise(when(col("__pv").isNull, lit(null))
            .when(col("__nv").isNull, col("__pv"))
            .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
              ((col("__pos") - col("__pp")).cast("double") /
                (col("__np") - col("__pp"))))))
      .drop("__pos", "__pv", "__pp", "__nv", "__np")
  }

  /** GLOBAL forward fill of a DOUBLE column, never a single-partition
    * window. `orderCols` must be a unique key (ties across a range
    * boundary would make "previous row" ambiguous).
    */
  def ffillGlobal(df: DataFrame, orderCols: Seq[String],
                  valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val v = col(valueCol).cast("double")
    val sorted = df
      .repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    // order-independent "latest non-null per partition": max_by skips
    // rows whose ordering expression is null, so null values never win
    val ordKey = when(v.isNotNull, struct(orderCols.map(col): _*))
    val lasts = sorted.groupBy(col("__pid"))
      .agg(max_by(v, ordKey).as("l"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1)
    // Empty range partitions are harmless here (unlike RollingGlobal's
    // pid+1 ghost hop): the run folds over the pids that actually hold
    // rows, in order, so a gap neither receives nor breaks a carry.
    val carries = scala.collection.mutable.Map[Int, Double]()
    var run: Option[Double] = None
    lasts.foreach { case (pid, l) =>
      run.foreach(carries(pid) = _)
      if (l.isDefined) run = l
    }
    val w = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry =
      if (carries.isEmpty) lit(null).cast("double")
      else element_at(typedlit(carries.toMap), col("__pid"))
    sorted
      .withColumn(valueCol, coalesce(last(v, ignoreNulls = true).over(w), carry))
      .drop("__pid")
  }
}
