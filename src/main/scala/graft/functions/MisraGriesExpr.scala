package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra–Gries heavy-hitters aggregate: the same sketch
  * semantics as the udaf twin [[MisraGries]] (reduce: present → +1,
  * room → insert, else decrement-all-drop-zeros; merge: sum then
  * subtract the (k+1)-largest), but over a MUTABLE java HashMap read
  * straight from the row — the udaf's immutable-Map buffer copies a
  * HAMT path per token (≈5 allocations/token, the q232 sketch-pass
  * hotspot). Candidate-set guarantee is identical (every item with
  * true frequency > N/(k+1) survives), so topKFrequent's
  * certify-or-fallback logic is unaffected by the swap.
  *
  * Returns the sorted candidate array, same as the twin.
  */
final class MGBuffer(val m: java.util.HashMap[String, Long])

case class MisraGriesExpr(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MGBuffer =
    new MGBuffer(new java.util.HashMap[String, Long](k * 2))

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val m = b.m
      // counters in the map are always ≥ 1, so 0 ⟺ absent (getOrDefault
      // avoids the null-unboxing trap of java HashMap.get)
      val cur = m.getOrDefault(s, 0L)
      if (cur > 0L) m.put(s, cur + 1L)
      else if (m.size < k) m.put(s, 1L)
      else {
        // classic MG decrement: −1 all, drop zeros
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    b
  }

  override def merge(x: MGBuffer, y: MGBuffer): MGBuffer = {
    val m = x.m
    val it = y.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      m.put(e.getKey, m.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (m.size > k) {
      // subtract the (k+1)-largest counter from all, drop non-positive
      val counts = new Array[Long](m.size)
      var i = 0
      val vi = m.values().iterator()
      while (vi.hasNext) { counts(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - 1 - k) // (k+1)-largest
      val ei = m.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= cut) ei.remove() else e.setValue(e.getValue - cut)
      }
    }
    x
  }

  override def eval(b: MGBuffer): Any = {
    val keys = new Array[String](b.m.size)
    var i = 0
    val ki = b.m.keySet().iterator()
    while (ki.hasNext) { keys(i) = ki.next(); i += 1 }
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_: String)))
  }

  override def serialize(b: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.m.size)
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed UTF-8, not writeUTF: writeUTF caps keys at
      // 65535 encoded bytes and a heavy-hitters pass over a long-string
      // column would throw UTFDataFormatException at shuffle time
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      m.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    new MGBuffer(m)
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesExpr = copy(child = c.head)
}

object MisraGriesExpr {
  /** `mg(k)(itemCol)` → sorted candidate array (native path). */
  def apply(k: Int)(c: Column): Column =
    ColumnBridge.column(
      MisraGriesExpr(ColumnBridge.expression(c), k).toAggregateExpression())
}
