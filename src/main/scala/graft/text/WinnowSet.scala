package graft.text

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowed fingerprint set (see [[Fingerprint]] scaladoc):
  * hash every k-char gram (first 16 hex chars of md5), slide a window of
  * `w` gram hashes with a monotonic deque (O(1) amortized per position),
  * emit the distinct window minima in first-occurrence order.
  *
  * Semantically identical to the composed explode → partitioned-window →
  * distinct pipeline ([[Fingerprint.fingerprints]]) but entirely
  * scan-stage: no explode multiplying rows by document length, no
  * shuffle on doc_id, no window sort — the per-document O(len) loop runs
  * inside whole-stage codegen where the 100 TB path wants it.
  * Round5Spec pins the equivalence against both the composed pipeline
  * and a plain-Scala fold.
  */
case class WinnowSet(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "k and w must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_set"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnowset", this, classOf[WinnowSet].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($c);")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val nGrams = s.length - k + 1
    val nWins = nGrams - w + 1
    if (nWins <= 0) return new GenericArrayData(Array.empty[Any])
    val md = WinnowSet.digest.get()
    // gram hashes: first 16 hex chars of md5 of the gram's UTF-8 bytes —
    // identical to md5(substr(text, i, k)) in Spark SQL and DuckDB
    val hashes = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      val d = md.digest(s.substring(i, i + k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](16)
      var b = 0
      while (b < 8) {
        hex(2 * b) = WinnowSet.HEX((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = WinnowSet.HEX(d(b) & 0xf)
        b += 1
      }
      hashes(i) = new String(hex)
      i += 1
    }
    // sliding window minimum via monotonic deque of indices
    val seen = new java.util.LinkedHashSet[String]()
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < nGrams) {
      // drop indices that left the window [i-w+1, i]
      while (head < tail && deque(head) <= i - w) head += 1
      // drop larger-or-equal values from the back: for equal hashes the
      // EARLIEST index must win (the SQL window min is value-identical
      // either way)
      while (head < tail && hashes(deque(tail - 1)).compareTo(hashes(i)) > 0) tail -= 1
      deque(tail) = i
      tail += 1
      if (i >= w - 1) seen.add(hashes(deque(head)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowSet =
    copy(child = c)
}

object WinnowSet {
  private val HEX = "0123456789abcdef".toCharArray
  private[text] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** [[WinnowSet]] with PRIMITIVE LONG output: the same first-8-bytes-of-
  * md5 gram hash, read as a big-endian unsigned 64-bit value instead of
  * rendered to 16 hex chars. The mapping hex-string → long is bijective
  * and hex lexicographic order == unsigned numeric order, so with
  * unsigned comparisons in the winnow deque the emitted fingerprint SET
  * is exactly `parseHex(WinnowSet(...))` (pinned in Round6Spec).
  *
  * Why it exists: downstream inverted-index operators (q169) shuffle on
  * the fingerprint — an 8-byte primitive key hash-aggregates in
  * Tungsten's primitive fast path and shuffles ~3× fewer bytes than a
  * 16-char UTF8String, and the hex render allocation disappears from
  * the scan. Keep the string variant where an external SQL oracle must
  * replay the hash (`substr(md5(..),1,16)`).
  */
case class WinnowSetLong(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_set_long"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnowsetlong", this, classOf[WinnowSetLong].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($c);")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val nGrams = s.length - k + 1
    val nWins = nGrams - w + 1
    if (nWins <= 0) return new GenericArrayData(Array.empty[Any])
    val md = WinnowSet.digest.get()
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      val d = md.digest(s.substring(i, i + k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      hashes(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < nGrams) {
      while (head < tail && deque(head) <= i - w) head += 1
      // UNSIGNED compare == hex lexicographic order of the string twin
      while (head < tail &&
        java.lang.Long.compareUnsigned(hashes(deque(tail - 1)), hashes(i)) > 0) tail -= 1
      deque(tail) = i
      tail += 1
      if (i >= w - 1) seen.add(hashes(deque(head)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowSetLong =
    copy(child = c)
}
