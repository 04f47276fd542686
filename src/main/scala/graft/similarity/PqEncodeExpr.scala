package graft.similarity

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass PQ encoder: the m-subspace argmin-centroid codes of
  * an embedding column in a single JVM loop.
  *
  * Bit-compatible with the composed form in [[PQ.Model.code]]
  * (`array_min` over m×ksub structs of
  * `dot(u,u) − 2·dot(u,c) + |c|²` with sequential-fold dot products,
  * ties → smallest j) — the SAME arithmetic in the SAME order, so the
  * DuckDB oracle's replay of that formula keeps hash-matching. The
  * composed twin stays as the differential-test reference
  * ([[PQ.Model.encodeComposed]]); this expression exists because the
  * composed tree is m·ksub≈4096 struct/dot nodes PER ROW — a
  * generated-code blob past the JIT's happy path — while one fused
  * loop is ~65k mul-adds the JIT vectorizes. (-0.0/NaN cannot arise
  * from these squared-distance values, so primitive `<` matches
  * Spark's struct-min double ordering; a null element nulls the whole
  * code array, same as the null-intolerant dot chain.)
  *
  * Same preference-tier-(b) pattern as text/TermCountsExpr
  * (SURVEY §4.3): scan-stage, codegen-friendly, partial-agg neutral.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = codebooks.length
  private val ksub = codebooks(0).length
  private val dsub = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** |c|² per centroid, the exact fold the composed form embeds as a
    * literal (`c.map(x => x*x).sum`).
    */
  @transient private lazy val cn2: Array[Array[Double]] =
    Array.tabulate(m, ksub)((s, j) => codebooks(s)(j).map(x => x * x).sum)

  def compute(a: ArrayData): Any = {
    if (a.numElements() < m * dsub) return null
    val out = new Array[Int](m)
    val u = new Array[Double](dsub)
    var s = 0
    while (s < m) {
      val base = s * dsub
      var i = 0
      while (i < dsub) {
        if (a.isNullAt(base + i)) return null
        u(i) = if (isFloat) a.getFloat(base + i).toDouble else a.getDouble(base + i)
        i += 1
      }
      var dotss = 0.0
      i = 0
      while (i < dsub) { dotss += u(i) * u(i); i += 1 }
      val cb = codebooks(s)
      val cn2s = cn2(s)
      var best = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < ksub) {
        val c = cb(j)
        var dotsc = 0.0
        i = 0
        while (i < dsub) { dotsc += u(i) * c(i); i += 1 }
        val d = dotss - 2.0 * dotsc + cn2s(j)
        if (d < best) { best = d; bestJ = j }
        j += 1
      }
      out(s) = bestJ
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqenc", this, classOf[PqEncode].getName)
    val r = ctx.freshName("pqr") // fixed locals collide if the expr appears twice in one scope
    nullSafeCodeGen(ctx, ev, a => s"""
      Object $r = $self.compute($a);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}
