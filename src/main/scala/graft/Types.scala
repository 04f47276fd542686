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

  /** numpy `find_common_type` over NAMED pandas dtypes, including the
    * unsigned family the Spark-type lattice can't distinguish (reference
    * `types.py:370-383` delegates to numpy; rules below are numpy's
    * documented promotion):
    *  - same kind → wider size;
    *  - signed vs unsigned → smallest signed that holds BOTH ranges
    *    (uint8+int8→int16, uint32+int32→int64); none exists for uint64 →
    *    float64;
    *  - int vs float32: int8/16/uint8/16 fit → float32; wider ints →
    *    float64; anything vs float64 → float64;
    *  - bool promotes to the other operand.
    */
  def promoteNamed(a: String, b: String): String = {
    def kindSize(n: String): (Char, Int) = n match {
      case "bool" => ('b', 1)
      case s if s.startsWith("uint") => ('u', s.stripPrefix("uint").toInt / 8)
      case s if s.startsWith("int") => ('i', s.stripPrefix("int").toInt / 8)
      case s if s.startsWith("float") => ('f', s.stripPrefix("float").toInt / 8)
      case other => throw new IllegalArgumentException(s"not numeric: $other")
    }
    val ((ka, sa), (kb, sb)) = (kindSize(a), kindSize(b))
    def name(k: Char, s: Int): String = k match {
      case 'b' => "bool"
      case 'u' => s"uint${s * 8}"
      case 'i' => s"int${s * 8}"
      case 'f' => s"float${s * 8}"
    }
    if (a == b) a
    else if (ka == 'b') b
    else if (kb == 'b') a
    else if (ka == kb) name(ka, math.max(sa, sb))
    else if (ka == 'f' || kb == 'f') {
      val (fs, is) = if (ka == 'f') (sa, sb) else (sb, sa)
      if (fs == 8 || is >= 4) "float64" else s"float${fs * 8}"
    } else {
      // one signed, one unsigned
      val (ss, us) = if (ka == 'i') (sa, sb) else (sb, sa)
      if (ss > us) name('i', ss)
      else if (us * 2 <= 8) name('i', us * 2)
      else "float64" // uint64 vs any signed: no int128
    }
  }

  /** numpy/pandas dtype NAME → Spark type along the SURVEY §1.3 lattice
    * (uints widen to the next signed; uint64 → DECIMAL(20,0)). Raises
    * on an unknown name — the reference's read_csv/astype dtype-string
    * error contract (`tests/io/read_csv_errors.py`,
    * `tests/pandas/sr_astype_invalid.py`).
    */
  def sparkTypeOf(name: String): DataType = name match {
    case "int8" => ByteType
    case "int16" => ShortType
    case "int32" => IntegerType
    case "int64" | "int" => LongType
    case "uint8" => ShortType
    case "uint16" => IntegerType
    case "uint32" => LongType
    case "uint64" | "uint" => DecimalType(20, 0) // 'uint' ≡ uint64 (types.py:207)
    case "float32" => FloatType
    case "float64" | "float" => DoubleType
    case "bool" => BooleanType
    case "str" | "string" | "object" => StringType
    case "datetime64[ns]" => TimestampType
    case other =>
      throw new IllegalArgumentException(s"unknown dtype '$other'")
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
