package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `astype` — dtype conversion with pandas semantics
  * (reference `legate/pandas/frontend/frame.py:163-182`,
  * ASTYPE task `src/transform/tasks/astype.cc:314`, string conversion
  * `src/string/converter.cc:185`).
  *
  * Numeric narrowing truncates toward zero like numpy/C casts — Spark's
  * `cast` to integral types already truncates, so `astype` is mostly
  * Spark `cast`. String→timestamp takes a strptime-style format
  * (`src/string/tasks/to_datetime.cc:314` supports %Y %m %d %H %M %S %y),
  * translated to Spark's java.time pattern.
  */
object Casts {

  /** Truncate toward zero, then wrap mod 2^N.
    *
    * The truncation runs in the SOURCE type's own arithmetic (`%` carries
    * the dividend's sign in double and decimal alike, so `c - c % 1`
    * truncates toward zero for both signs — the numpy float→int C
    * conversion). It must happen BEFORE any decimal cast: casting a
    * double straight to decimal(38,6) HALF_UP-rounds at 1e-6, which
    * pulled values within 5e-7 below an integer UP (255.9999999 → 256 →
    * wraps to 0 where numpy truncates to 255). For doubles the
    * subtraction is exact — below 2^53 both the remainder and the
    * integral part are representable; at/above 2^53 every double is
    * already integral and `% 1` is zero. The decimal(38,0) carrier then
    * keeps exact integers up to 10^38 (the whole uint64 range plus the
    * DECIMAL(38,0) products UnsignedOps can produce); past that the cast
    * overflows (null or error per the session's ANSI setting).
    */
  private def uintWrap(c: Column, modulus: String): Column = {
    val t = (c - (c % lit(1))).cast("decimal(38,0)")
    pmod(t, lit(new java.math.BigDecimal(modulus)))
  }

  def astype(c: Column, dtype: String): Column = dtype match {
    case "int8"    => c.cast("byte")
    case "int16"   => c.cast("short")
    case "int32"   => c.cast("int")
    case "int64"   => c.cast("long")
    // unsigned targets: numpy astype WRAPS modulo 2^N (Series([300])
    // .astype('uint8') == 44, .astype of -1 == 2^N - 1), then the value
    // lives in the widened signed storage type of the SURVEY §1.3
    // lattice. All four widths go through the same source-space
    // truncate-toward-zero + decimal(38,0) pmod so inputs beyond long
    // range (uint64 values, DECIMAL(38,0) intermediates) wrap mod 2^N
    // instead of clamping/nulling at a long cast; fractional inputs
    // truncate toward zero like the C conversion numpy performs.
    // |x| ≥ 10^38 (floats far past the uint64 range, where numpy's
    // conversion is undefined) overflows the decimal carrier (null or
    // error per the session's ANSI setting).
    case "uint8"   => uintWrap(c, "256").cast("short")
    case "uint16"  => uintWrap(c, "65536").cast("int")
    case "uint32"  => uintWrap(c, "4294967296").cast("long")
    case "uint64"  => uintWrap(c, "18446744073709551616").cast("decimal(20,0)")
    case "float32" => c.cast("float")
    case "float64" => c.cast("double")
    case "bool"    => c.cast("boolean")
    case "string"  => c.cast("string")
    // reference error contract (tests/pandas/sr_astype_invalid.py:20-24):
    // numeric→datetime64[ns] raises NotImplementedError there, and an
    // unknown dtype name raises — Spark's permissive cast would instead
    // accept anything cast-able, so fail eagerly at plan-build time
    case "datetime64[ns]" =>
      throw new UnsupportedOperationException(
        "astype to datetime64[ns] is not supported — use toDatetime(col, format)")
    case other =>
      throw new IllegalArgumentException(s"astype: unknown dtype '$other'")
  }

  /** strptime-style → Spark datetime pattern, covering every directive
    * the reference's parser handles (`src/string/tasks/to_datetime.cc:211-246`:
    * %Y %y %m %d %j %H %I %M %S %f %p %z %Z, plus %% escapes).
    *
    * Two-digit-year pivot divergence, documented: the reference adds a
    * flat 1900; POSIX/pandas/DuckDB pivot at 69 (00–68 → 2000s); Spark's
    * `yy` parses into 2000–2099. All agree on 00–68 ⇒ oracle checks stay
    * in that range. %f is the 6-digit microsecond field (pandas), %z an
    * offset like +0130, %Z a zone name.
    */
  def strptimeToJava(fmt: String): String = {
    val map = Seq(
      "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd",
      "%j" -> "DDD", "%H" -> "HH", "%I" -> "hh", "%M" -> "mm",
      "%S" -> "ss", "%f" -> "SSSSSS", "%p" -> "a", "%z" -> "xxxx",
      "%Z" -> "zzz")
    val esc = "\u0000" // placeholder so %% survives the directive pass
    val translated = map.foldLeft(fmt.replace("%%", esc)) {
      case (s, (from, to)) => s.replace(from, to)
    }
    translated.replace(esc, "%")
  }

  /** to_datetime(col, format) — string → timestamp. */
  def toDatetime(c: Column, strptimeFmt: String): Column =
    to_timestamp(c, strptimeToJava(strptimeFmt))
}
