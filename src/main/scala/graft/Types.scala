package graft

import org.apache.spark.sql.types._

/** pandas ↔ Spark dtype lattice (SURVEY §1.3; reference
  * `legate/pandas/common/types.py:94-222`).
  *
  * Divergences, pinned and documented:
  *  - unsigned ints: Spark has none → widen to the next signed type;
  *    uint64 → DecimalType(20,0) preserves the full range
  *    (`types.py:72-104`).
  *  - datetime64[ns] → TimestampType (µs): ns are truncated; the
  *    reference itself stores timestamps as int64 ns (`types.py:112-121`).
  *  - category → StringType values + a broadcast dictionary frame; codes
  *    via sorted-dictionary dense_rank (see q72_cat_codes).
  *  - NaN vs null: pandas' float sentinel is NaN (`types.py:417-423`);
  *    Spark separates them, so isna = isNull || isNaN
  *    (graft.functions.PandasArith.isna).
  */
object Types {

  /** pandas dtype name → Spark type. */
  val toSpark: Map[String, DataType] = Map(
    "bool" -> BooleanType,
    "int8" -> ByteType, "int16" -> ShortType,
    "int32" -> IntegerType, "int64" -> LongType,
    "uint8" -> ShortType, "uint16" -> IntegerType,
    "uint32" -> LongType, "uint64" -> DecimalType(20, 0),
    "float32" -> FloatType, "float64" -> DoubleType,
    "datetime64[ns]" -> TimestampType,
    "string" -> StringType,
    "category" -> StringType)

  private val numericOrder: Seq[DataType] =
    Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  /** numpy-style binary-op promotion (`types.py:372-385`): wider numeric
    * wins; any float makes the result float; bool promotes to the other
    * operand.
    */
  def promote(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (BooleanType, y) => y
    case (x, BooleanType) => x
    case (x, y) if numericOrder.contains(x) && numericOrder.contains(y) =>
      val (ix, iy) = (numericOrder.indexOf(x), numericOrder.indexOf(y))
      // int64 ⊕ float32 → float64 like numpy (precision-preserving)
      if ((x == LongType && y == FloatType) || (x == FloatType && y == LongType)) DoubleType
      else numericOrder(math.max(ix, iy))
    case (StringType, _) | (_, StringType) => StringType
    case (x, _) => x
  }

  /** Reduction result dtypes (`types.py:445-466`): count/size → int,
    * mean/var/std → double, any/all → bool, else input dtype.
    */
  def reductionType(fn: String, input: DataType): DataType = fn match {
    case "count" | "size" => LongType
    case "mean" | "var" | "std" => DoubleType
    case "any" | "all" => BooleanType
    case _ => input
  }

  /** Nullable dtypes in the reference (`types.py:408-414`): only
    * float/timestamp/category/string admit missing values natively.
    */
  def referenceNullable(t: DataType): Boolean = t match {
    case FloatType | DoubleType | TimestampType | StringType => true
    case _ => false
  }
}
