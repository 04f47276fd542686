package graft.similarity

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native b-bit hyperplane signature: one fused loop over a planes
  * matrix instead of the composed form's 32 [[DotProduct]] expressions
  * + when-chains + bitwiseOR fold (32 child evals and 64 branch nodes
  * per row on the hot path of every sign-signature operator:
  * q373/q379-q384/q388/q390).
  *
  * Bit-compatible with the composed form by construction (SignBitsSpec
  * pins ≡ including the corners): per plane, the dot is the SAME
  * sequential float→double product fold as [[DotProduct]]; a length
  * mismatch or null element makes that plane's dot null, whose
  * `when(dot >= 0, …).otherwise(0)` contributes bit 0. A NaN dot sets
  * the bit: Spark's comparison total order (and DuckDB's) places NaN
  * ABOVE every number, so the composed `NaN >= 0` is TRUE — replicated
  * here. A null INPUT array yields signature 0L
  * (every bit's condition is null → otherwise(0)), so the expression
  * is non-nullable like the composed fold.
  */
case class SignBitsExpr(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "sign_bits"

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    // any null element nulls every plane's dot → all bits 0
    var d = 0
    while (d < n) { if (a.isNullAt(d)) return 0L; d += 1 }
    var sig = 0L
    var p = 0
    while (p < mat.length) {
      val pl = mat(p)
      if (pl.length == n) {
        var acc = 0.0
        var i = 0
        if (isFloat) while (i < n) { acc += a.getFloat(i).toDouble * pl(i); i += 1 }
        else while (i < n) { acc += a.getDouble(i) * pl(i); i += 1 }
        if (acc >= 0 || java.lang.Double.isNaN(acc)) sig |= 1L << p
      }
      p += 1
    }
    sig
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else compute(v.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("signbits", this, classOf[SignBitsExpr].getName)
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = 0L;
      if (!${childGen.isNull}) { ${ev.value} = $self.compute(${childGen.value}); }
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): SignBitsExpr =
    copy(child = c)
}
