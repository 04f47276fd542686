package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Cumulative scans: cumsum / cummin / cummax / cumprod
  * (reference `legate/pandas/frontend/frame.py:396-430`).
  *
  * The reference computes a global scan in two phases: a per-piece local
  * scan plus a per-piece carry buffer, then a second pass adds the
  * carry-in (`core/column.py:644-687`; SCAN task
  * `src/reduction/tasks/scan.cc:262`). A naive Spark translation —
  * `Window.orderBy(...)` with no partitionBy — funnels ALL rows through a
  * single partition and cannot scale.
  *
  * [[globalScan]] reproduces the reference's two-phase algorithm on
  * Spark primitives and stays fully distributed:
  *   1. range-repartition + sort within partitions on the order key
  *      (Spark's sampled RangePartitioner — same sample/histogram trick
  *      as the reference's sort, `core/sort.py:93-174`);
  *   2. one pass computing each partition's total (tiny: one double per
  *      partition, collected to the driver);
  *   3. exclusive prefix over the totals, broadcast back, and a second
  *      partition-local pass adding the carry-in.
  * Cost: one range shuffle + two narrow passes; no single-partition
  * bottleneck at any scale.
  *
  * For grouped cumulatives (many small groups) use [[groupedScan]] —
  * an ordinary partitioned window, which Spark executes with one hash
  * shuffle on the group keys.
  */
object Cumulative {

  sealed trait ScanOp {
    def zero: Double
    def apply(a: Double, b: Double): Double
  }
  case object SumOp extends ScanOp { val zero = 0.0; def apply(a: Double, b: Double): Double = a + b }
  case object ProdOp extends ScanOp { val zero = 1.0; def apply(a: Double, b: Double): Double = a * b }
  case object MinOp extends ScanOp { val zero = Double.PositiveInfinity; def apply(a: Double, b: Double): Double = math.min(a, b) }
  case object MaxOp extends ScanOp { val zero = Double.NegativeInfinity; def apply(a: Double, b: Double): Double = math.max(a, b) }

  /** Distributed global cumulative scan of `valueCol` in `orderCols`
    * order, appended as `outCol` (double). skipna: null values carry the
    * running value forward and produce null output, like pandas skipna.
    */
  def globalScan(df: DataFrame, orderCols: Seq[String], valueCol: String,
                 outCol: String, op: ScanOp): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df
      .repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .cache()
    val valIdx = sorted.schema.fieldIndex(valueCol)

    // Phase 1: per-partition totals (one double per partition).
    val totals: Array[(Int, Double)] = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var acc = op.zero
        var seen = false
        it.foreach { r =>
          if (!r.isNullAt(valIdx)) {
            val v = r.get(valIdx) match {
              case d: Double => d; case f: Float => f.toDouble
              case l: Long => l.toDouble; case i: Int => i.toDouble
              case s: Short => s.toDouble; case b: Byte => b.toDouble
              case x => x.toString.toDouble
            }
            if (!v.isNaN) { acc = op(acc, v); seen = true }
          }
        }
        Iterator.single((pid, if (seen) acc else op.zero))
      }.collect()

    // Exclusive prefix of totals → carry-in per partition (driver-side,
    // O(numPartitions) — trivially small even with 10^5 partitions).
    val byPid = totals.sortBy(_._1).map(_._2)
    val carries = new Array[Double](byPid.length + 1)
    carries(0) = op.zero
    for (i <- byPid.indices) carries(i + 1) = op(carries(i), byPid(i))
    val bc = spark.sparkContext.broadcast(carries)

    // Phase 2: partition-local scan + carry-in.
    val outSchema = StructType(sorted.schema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val resRdd: RDD[Row] = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        val vAny = if (r.isNullAt(valIdx)) null else r.get(valIdx)
        val out: Any = vAny match {
          case null => null
          case x =>
            val v = x match {
              case d: Double => d; case f: Float => f.toDouble
              case l: Long => l.toDouble; case i: Int => i.toDouble
              case s: Short => s.toDouble; case b: Byte => b.toDouble
              case y => y.toString.toDouble
            }
            if (v.isNaN) null else { acc = op(acc, v); acc }
        }
        Row.fromSeq(r.toSeq :+ out)
      }
    }
    spark.createDataFrame(resRdd, outSchema)
  }

  /** Per-group cumulative via a partitioned window — one hash shuffle on
    * the group keys; safe at scale when groups are small relative to a
    * partition.
    */
  def groupedScan(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
                  valueCol: String, outCol: String, fn: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = col(valueCol)
    val expr = fn match {
      case "cumsum" => sum(c).over(w)
      case "cummin" => min(c).over(w)
      case "cummax" => max(c).over(w)
      case "cumprod" =>
        // exact sequential multiply via the ProdAgg window aggregate —
        // exp(sum(log)) decompositions drift at the last ulp and mangle
        // zeros/negatives.
        graft.functions.ProdAgg.prod(c).over(w)
      case other => throw new IllegalArgumentException(other)
    }
    df.withColumn(outCol, expr)
  }
}
