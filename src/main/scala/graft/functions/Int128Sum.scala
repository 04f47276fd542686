package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact 128-bit integer sum over a pre-scaled LongType column — the
  * engine's money-sum kernel.
  *
  * Motivation (measured r12, sf0.1 lineitem, 600k rows): summing
  * `DECIMAL(12,2)` widens the accumulator to precision 22, which falls
  * off Spark's compact-long Decimal representation onto the BigDecimal
  * slow path — 3.7× slower end-to-end than summing the same values as
  * long "cents". But a plain `sum(long)` caps the exact range at 2^63
  * scaled units, which a 100 TB revenue sum (scale-4 units) would
  * overflow. This aggregate keeps integer speed AND unbounded-practical
  * exactness by accumulating into two longs (hi, lo) — the same int128
  * ("hugeint") accumulation DuckDB uses for decimal sums.
  *
  * All arithmetic is declarative Catalyst (wrapping LEGACY adds +
  * bitwise carry propagation), so the aggregate whole-stage-codegens
  * with a fixed-width (long, long, boolean) buffer — it stays inside
  * Tungsten's fast hash map, never falling to the generic object path.
  *
  *   update:  (hi, lo) +128= sign-extend(v)
  *   merge:   (hi, lo) +128= (hi2, lo2)   [lo2's carry into hi2]
  *   result:  (hi·2^64 + unsigned(lo)) / 10^scale  as DECIMAL(38,6),
  *            null iff no non-null input (pandas sum-of-empty contract
  *            is applied by callers).
  *
  * Capacity: |true sum| < 2^127 scaled units ≈ 1.7e38 — beyond any
  * conceivable corpus (a 100 TB TPC-H revenue total is ~2.3e20 scale-4
  * units). The merge carry math is exact for any mix of signs.
  *
  * The final decimal value is EXACT (the division by 10^scale only
  * shifts the point; result scale 6 ≥ input scale ≤ 4), so rounding and
  * double-conversion downstream behave bit-identically to the previous
  * `sum(DECIMAL(12,2))` formulation — pinned by Int128SumSpec.
  */
case class Int128Sum(child: Expression, scale: Int)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 6)
  override def prettyName: String = "int128_sum"

  private val hi = AttributeReference("hi", LongType, nullable = false)()
  private val lo = AttributeReference("lo", LongType, nullable = false)()
  private val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  // Wrapping (non-ANSI) long add: int128 limbs overflow by design.
  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  // Carry-out of the unsigned 64-bit add a + b = s:
  // majority(msb(a), msb(b), !msb(s)) as a 0/1 long.
  private def carryOut(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  override val updateExpressions: Seq[Expression] = {
    val v = Coalesce(Seq(child, Literal(0L)))
    val newLo = wadd(lo, v)
    val vHi = ShiftRight(v, Literal(63)) // sign extension: 0 or -1
    val newHi = wadd(wadd(hi, vHi), carryOut(lo, v, newLo))
    Seq(newHi, newLo, Or(seen, IsNotNull(child)))
  }

  override val mergeExpressions: Seq[Expression] = {
    val newLo = wadd(lo.left, lo.right)
    val newHi = wadd(wadd(hi.left, hi.right), carryOut(lo.left, lo.right, newLo))
    Seq(newHi, newLo, Or(seen.left, seen.right))
  }

  override val evaluateExpression: Expression = {
    val dec38 = DecimalType(38, 0)
    val twoTo64 = Literal(Decimal(BigDecimal("18446744073709551616")), dec38)
    val loUnsigned = If(GreaterThanOrEqual(lo, Literal(0L)),
      Cast(lo, dec38),
      Add(Cast(lo, dec38), twoTo64))
    val total = Add(Multiply(Cast(hi, dec38), twoTo64), loUnsigned)
    val value = Cast(Divide(total, Literal(Decimal(math.pow(10, scale).toLong), DecimalType(10, 0))),
      DecimalType(38, 6))
    If(seen, value, Literal(null, DecimalType(38, 6)))
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Int128Sum = copy(child = c.head)
}

object Int128Sum {
  /** Exact sum of a pre-scaled long column, returned as DECIMAL(38,6)
    * carrying value = sum / 10^scale.
    */
  def apply(scaledUnits: Column, scale: Int): Column =
    ColumnBridge.column(
      Int128Sum(ColumnBridge.expression(scaledUnits), scale).toAggregateExpression())
}
