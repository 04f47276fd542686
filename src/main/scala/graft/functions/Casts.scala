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

  def astype(c: Column, dtype: String): Column = dtype match {
    case "int8"    => c.cast("byte")
    case "int16"   => c.cast("short")
    case "int32"   => c.cast("int")
    case "int64"   => c.cast("long")
    // unsigned targets: numpy astype WRAPS modulo 2^N (Series([300])
    // .astype('uint8') == 44, .astype of -1 == 2^N - 1), then the value
    // lives in the widened signed storage type of the SURVEY §1.3
    // lattice. Float inputs truncate toward zero first (Spark's
    // double→long cast), like the C conversion numpy performs.
    case "uint8"   => pmod(c.cast("long"), lit(256L)).cast("short")
    case "uint16"  => pmod(c.cast("long"), lit(65536L)).cast("int")
    case "uint32"  => pmod(c.cast("long"), lit(4294967296L))
    case "uint64"  =>
      pmod(c.cast("decimal(38,0)"),
        lit(new java.math.BigDecimal("18446744073709551616")))
        .cast("decimal(20,0)")
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
