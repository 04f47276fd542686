package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Element-wise binary/unary operators with pandas semantics.
  *
  * The reference implements these as per-piece typed kernels
  * (reference `src/binaryop/binary_op.h:57-193`,
  * `src/binaryop/tasks/binary_op.cc`); here each is a plain Catalyst
  * expression so it stays inside whole-stage codegen.
  *
  * Semantics pinned to the reference:
  *  - true division always yields double, even int/int
  *    (`binary_op.h:84-89`).
  *  - floor division is `floor(a / b)` (`binary_op.h:91-99`).
  *  - mod has the sign of the divisor, Python-style:
  *    `((a % b) + b) % b` (`binary_op.h:100-110`).
  *  - comparisons are non-nullable: null inputs compare as false
  *    (reference `core/runtime.py:142` NON_NULLABLE_BINARY_OP).
  */
object PandasArith {
  def add(a: Column, b: Column): Column = a + b
  def sub(a: Column, b: Column): Column = a - b
  def mul(a: Column, b: Column): Column = a * b

  /** pandas truediv: int/int → double (`binary_op.h:84-89`). */
  def truediv(a: Column, b: Column): Column =
    a.cast("double") / b.cast("double")

  /** pandas floordiv: floor of true division (`binary_op.h:91-99`). */
  def floordiv(a: Column, b: Column): Column = floor(truediv(a, b))

  /** Python-style mod: result takes the divisor's sign
    * (`binary_op.h:100-110`). Equivalent to `((a % b) + b) % b`.
    */
  def pymod(a: Column, b: Column): Column = ((a % b) + b) % b

  def pow(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.pow(a, b)

  /** Null-insensitive comparisons: pandas comparisons never yield null —
    * a null operand compares false (`core/runtime.py:142`). Spark's
    * three-valued logic yields null, so wrap in coalesce(..., false).
    */
  def eqNullFalse(a: Column, b: Column): Column = coalesce(a === b, lit(false))
  def neNullTrue(a: Column, b: Column): Column = coalesce(a =!= b, lit(true))
  def ltNullFalse(a: Column, b: Column): Column = coalesce(a < b, lit(false))
  def gtNullFalse(a: Column, b: Column): Column = coalesce(a > b, lit(false))
  def leNullFalse(a: Column, b: Column): Column = coalesce(a <= b, lit(false))
  def geNullFalse(a: Column, b: Column): Column = coalesce(a >= b, lit(false))

  /** Unary ops (`src/unaryop/tasks/unary_op.cc:89`, codes
    * `legate/pandas/config.py:117-119`): abs, bit_invert, neg.
    */
  def absCol(a: Column): Column = abs(a)
  def bitInvert(a: Column): Column = bitwise_not(a)
  def neg(a: Column): Column = negate(a)

  /** `isna` must treat float NaN as missing like pandas does: the
    * reference's null sentinel for floats IS NaN
    * (`legate/pandas/common/types.py:417-423`), while Spark distinguishes
    * NaN from null.
    */
  def isna(a: Column): Column =
    a.isNull || coalesce(isnan(a.try_cast("double")), lit(false))
  def notna(a: Column): Column = !isna(a)
}
