package graft.similarity

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sequential dot product of two numeric array columns in double.
  *
  * Bit-compatible with the composed form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`
  * (the same left-to-right fold of the element products — double
  * addition is order-dependent, so the fold order is part of the
  * contract with the DuckDB oracle's list_sum/list_transform mirror),
  * but evaluated as one JVM loop instead of two interpreted
  * higher-order lambdas with per-element dispatch.
  *
  * Null contract, matching zip_with+aggregate: mismatched lengths pad
  * with null and a null element nulls the whole sum.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(la: ArrayData, ra: ArrayData): java.lang.Double = {
    val n = la.numElements()
    if (ra.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      acc += get(la, i, leftFloat) * get(ra, i, rightFloat)
      i += 1
    }
    acc
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dotprod", this, classOf[DotProduct].getName)
    // freshName, NOT a fixed local: two dot_products in one projection
    // (e.g. the PCA-distance expansion ‖q‖²−2q·c+‖c‖²) otherwise emit
    // two `r` declarations in one codegen scope — janino rejects the
    // whole stage and it silently runs interpreted (caught r12c: the
    // q256/q259 plans were falling back).
    val r = ctx.freshName("dotr")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double $r = $self.compute($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}
