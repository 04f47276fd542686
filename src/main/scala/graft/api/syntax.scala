package graft.api

import org.apache.spark.sql.Column
import graft.functions.{Casts, PandasArith, StringOps}

/** Ergonomic pandas-semantics syntax on Spark Columns:
  *
  * {{{
  * import graft.api.syntax._
  * df.filter($"a".pyMod(7) === 2 && !$"b".isna)
  *   .select($"name".zfill(8), $"x".floorDiv($"y"))
  * }}}
  *
  * Each method delegates to the graft.functions modules, so the
  * semantics (Python mod sign, NaN-as-missing, non-truncating zfill, …)
  * stay in one place.
  */
object syntax {

  implicit final class PandasColumnOps(private val c: Column) extends AnyVal {
    // arithmetic (src/binaryop/binary_op.h semantics)
    def trueDiv(o: Column): Column = PandasArith.truediv(c, o)
    def floorDiv(o: Column): Column = PandasArith.floordiv(c, o)
    def pyMod(o: Column): Column = PandasArith.pymod(c, o)
    def pyMod(o: Long): Column = PandasArith.pymod(c, org.apache.spark.sql.functions.lit(o))

    // missing data (NaN AND null are missing)
    def isna: Column = PandasArith.isna(c)
    def notna: Column = PandasArith.notna(c)

    // non-nullable comparisons (null compares false)
    def eqF(o: Column): Column = PandasArith.eqNullFalse(c, o)
    def ltF(o: Column): Column = PandasArith.ltNullFalse(c, o)
    def gtF(o: Column): Column = PandasArith.gtNullFalse(c, o)

    // dtypes
    def astype(dtype: String): Column = Casts.astype(c, dtype)

    // str accessor
    def strLower: Column = StringOps.lower(c)
    def strUpper: Column = StringOps.upper(c)
    def strSwapcase: Column = StringOps.swapcase(c)
    def zfill(width: Int): Column = StringOps.zfill(c, width)
    def strPad(width: Int, side: String, fill: String = " "): Column =
      StringOps.pad(c, width, side, fill)
    def strStrip: Column = StringOps.strip(c)
    def strContains(pattern: String, regex: Boolean = true): Column =
      StringOps.contains(c, pattern, regex)
    def toDatetime(fmt: String): Column = StringOps.toDatetime(c, fmt)

    // dt accessor
    def dtYear: Column = graft.functions.DatetimeOps.year(c)
    def dtMonth: Column = graft.functions.DatetimeOps.month(c)
    def dtDay: Column = graft.functions.DatetimeOps.day(c)
    def dtWeekday: Column = graft.functions.DatetimeOps.weekday(c)
  }
}
