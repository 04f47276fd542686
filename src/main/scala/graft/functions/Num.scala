package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Float rounding that hash-matches DuckDB.
  *
  * Spark's `round(x, n)` rounds the SHORTEST-DECIMAL representation of the
  * double (`BigDecimal.valueOf`), while DuckDB rounds the true binary
  * value via `std::round(x * 10^n) / 10^n`. For values like
  * 68210.43/32 = 2131.5759374999998 (repr "2131.5759375") the two
  * disagree in the last digit. Computing the same scale/round/unscale
  * formula on both engines makes the result bit-identical: after the
  * multiply both see the same double, scale-0 rounding agrees everywhere
  * (away-from-zero at exact .5, nearest otherwise), and the final
  * division is identical IEEE arithmetic.
  *
  * Requires |x|·10^digits < 2^53 — callers round small magnitudes to 6
  * digits and large (money-sum) magnitudes to 2.
  */
object Num {
  def rnd(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    round(c * lit(p)) / lit(p)
  }
}
