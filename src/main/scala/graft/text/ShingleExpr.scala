package graft.text

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token n-gram shingle set.
  *
  * Semantically identical to the composed form
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ", slice(tokens, i+1, n))))`
  * (with empty tokens filtered and the <n-token guard) — but those
  * higher-order array functions are evaluated interpreted, one lambda
  * dispatch + row wrapper per element. This expression tokenizes,
  * windows, and dedups in a single JVM loop; TextSpec pins the
  * equivalence against the composed form's outputs.
  *
  * Distinct keeps first-occurrence order, like `array_distinct`.
  */
case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleset", this, classOf[ShingleSet].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($c);")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    // whitespace-run tokens: split on single space, drop empties
    // (Shingles.scaladoc: the corpus convention is single-space)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      var j = s.indexOf(' ', i)
      if (j < 0) j = len
      if (j > i) toks.add(s.substring(i, j))
      i = j + 1
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var w = 0
    while (w < m) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(toks.get(w + t))
        t += 1
      }
      seen.add(sb.toString)
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShingleSet =
    copy(child = c)
}

/** All ordered pairs (a[i], a[j]) with i<j from a sorted long array,
  * packed as (a[i] << 32) | a[j] — the map-side pair expansion of an
  * inverted shingle/bucket index. Replaces the interpreted
  * `flatten(transform(ds, (x,i) -> transform(slice(...), y -> ...)))`
  * chain: one allocation, two JVM loops.
  */
case class PackedPairs(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "packed_pairs"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("packedpairs", this, classOf[PackedPairs].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($c);")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val ids = arr.toLongArray()
    val out = new Array[Long](m * (m - 1) / 2)
    var k = 0
    var i = 0
    while (i < m) {
      val hi = ids(i) << 32
      var j = i + 1
      while (j < m) {
        out(k) = hi | ids(j)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PackedPairs =
    copy(child = c)
}
