package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.reflect.runtime.universe.TypeTag

/** Per-partition carry lookup for the two-phase scan operators
  * ([[Cumulative]], [[RollingGlobal]]): each row needs the O(1) value
  * its partition's carry map assigns to `__pid`.
  *
  * Below [[ThresholdConf]] entries (default 1000) the map rides the
  * plan as a `typedlit` literal — zero extra joins, codegen-resident.
  * Above it, a 100 TB job running 10⁴–10⁵ shuffle partitions would
  * inline a multi-MB literal into every generated class, so the map
  * becomes a tiny BROADCAST join instead: same algorithm, same one
  * value per row, but the table ships once per executor via the
  * broadcast channel rather than once per codegen unit.
  */
private[graft] object PidCarry {

  val ThresholdConf = "spark.graft.carryBroadcastThreshold"

  /** Append `outName` = `m(pidCol)`, falling back to `default` for
    * pids absent from the map (e.g. partitions that held no rows).
    */
  def withLookup[V: TypeTag](df: DataFrame, pidCol: Column, m: Map[Int, V],
                             default: Column, outName: String): DataFrame = {
    val spark = df.sparkSession
    val threshold = spark.conf.get(ThresholdConf, "1000").toInt
    if (m.size <= threshold)
      df.withColumn(outName,
        coalesce(element_at(typedlit(m), pidCol), default))
    else {
      val lookup = broadcast(
        spark.createDataFrame(m.toSeq).toDF("__carry_pid", "__carry_val"))
      df.join(lookup, pidCol === col("__carry_pid"), "left")
        .withColumn(outName, coalesce(col("__carry_val"), default))
        .drop("__carry_pid", "__carry_val")
    }
  }
}
