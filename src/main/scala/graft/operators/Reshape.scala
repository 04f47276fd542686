package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide↔long reshapes: pandas `melt` / `pivot_table`
  * (reference exposes the underlying frame model in
  * `legate/pandas/frontend/frame.py`; melt/pivot_table themselves are
  * pandas surfaces the reference defers to — beyond-parity here).
  *
  * Both shapes are chosen for the 100 TB plan, not the 60 kB one:
  *
  *  - [[melt]] is a pure scan-stage explode — each input row emits
  *    `len(valueVars)` output rows inside the same whole-stage-codegen
  *    pipeline; NO shuffle, no driver involvement, arbitrarily wide
  *    inputs stream through.
  *  - [[pivotTable]] is one hash aggregation on the index keys.  The
  *    pivoted column's dictionary is either caller-supplied (zero extra
  *    jobs — the 100 TB path, where you know the categories) or
  *    discovered with the same cardinality-guarded sort+limit fetch as
  *    [[Categorical.infer]], so a mistyped high-cardinality pivot fails
  *    fast instead of OOMing the driver.  Spark compiles the pivot to a
  *    single `groupBy(index).agg(pivotfirst…)` — one exchange total.
  */
object Reshape {

  /** pandas `df.melt(id_vars, value_vars, var_name, value_name)`.
    *
    * All `valueVars` are cast to a common type (their least upper bound
    * must exist — e.g. all numerics → double); each row explodes into
    * one `(variable, value)` pair per value column.  Null values are
    * KEPT (pandas keeps them); row order within a doc is the valueVars
    * order, as in pandas.
    */
  def melt(df: DataFrame, idVars: Seq[String], valueVars: Seq[String],
           varName: String = "variable", valueName: String = "value"): DataFrame = {
    require(valueVars.nonEmpty, "melt needs at least one value column")
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val vTypes = valueVars.map(fields)
    // heterogeneous value columns only widen when ALL are numeric —
    // a string+double melt would silently null unparsable strings,
    // indistinguishable from pandas' kept nulls, so it fails instead
    require(vTypes.distinct.size == 1 ||
      vTypes.forall(_.isInstanceOf[org.apache.spark.sql.types.NumericType]),
      s"melt value columns have no numeric LUB: ${
        valueVars.zip(vTypes).map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}")
    val lub = vTypes.reduce(numericLub)
    val pairs = array(valueVars.map(v =>
      struct(lit(v).as("k"), col(v).cast(lub).as("v"))): _*)
    df.select(idVars.map(col) :+ explode(pairs).as("kv"): _*)
      .select(idVars.map(col) :+ col("kv.k").as(varName) :+ col("kv.v").as(valueName): _*)
  }

  /** Least upper bound of two numeric types that loses no values:
    * int+long→long, long+decimal→wide-enough decimal, anything with a
    * float/double→double — NOT the old unconditional double, which
    * silently lost precision for long/decimal beyond 2^53.
    */
  private def numericLub(a: org.apache.spark.sql.types.DataType,
                         b: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    // rank: position in the widening chain; digits: max base-10 integer
    // digits the type can hold (for the decimal LUB)
    val integral: Map[DataType, (Int, Int)] = Map(
      ByteType -> (1, 3), ShortType -> (2, 5),
      IntegerType -> (3, 10), LongType -> (4, 20))
    if (a == b) a
    else (a, b) match {
      case (d: DecimalType, e: DecimalType) =>
        val s = math.max(d.scale, e.scale)
        val i = math.max(d.precision - d.scale, e.precision - e.scale)
        DecimalType(math.min(i + s, DecimalType.MAX_PRECISION), s)
      case (d: DecimalType, i) if integral.contains(i) =>
        DecimalType(math.min(
          math.max(d.precision - d.scale, integral(i)._2) + d.scale,
          DecimalType.MAX_PRECISION), d.scale)
      case (i, d: DecimalType) if integral.contains(i) => numericLub(d, i)
      // any float/double participant → double (matches Spark's own
      // fractional promotion; decimals were handled above)
      case (FloatType | DoubleType, _) | (_, FloatType | DoubleType) => DoubleType
      case (x, y) if integral.contains(x) && integral.contains(y) =>
        if (integral(x)._1 >= integral(y)._1) x else y
      case other => throw new IllegalArgumentException(
        s"melt: no numeric LUB for $other")
    }
  }

  /** pandas `pivot_table(index=, columns=, values=, aggfunc=)`.
    *
    * @param pivotValues the column dictionary; None → guarded discovery
    *                    (sorted for deterministic column order).
    */
  def pivotTable(df: DataFrame, index: Seq[String], columns: String,
                 values: String, aggFn: Column => Column,
                 pivotValues: Option[Seq[String]] = None): DataFrame = {
    val dict = pivotValues.getOrElse(
      Categorical.guardedDistinct(df, columns, "pivot_table column discovery"))
    df.groupBy(index.map(col): _*)
      .pivot(columns, dict)
      .agg(aggFn(col(values)))
  }
}
