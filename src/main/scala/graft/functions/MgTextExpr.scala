package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Buffer for [[MisraGriesTextExpr]]: the MG counter map plus the total
  * token count (so the fit pass needs exactly ONE tokenization of the
  * corpus — the explode + separate count() shape tokenized per pass).
  */
final class MGTextBuffer(val m: java.util.HashMap[String, Long], var total: Long)

/** [[MisraGriesExpr]] fused with whitespace tokenization: consumes the
  * TEXT column directly and applies the MG step per non-empty token —
  * no Generate (explode) stage, no per-token row materialization, no
  * string-keyed hash-agg rows. Token order within a document (and
  * across documents within a partition) is identical to
  * `explode(tokensNonEmpty(text))`, and documents never straddle
  * partitions under explode either, so the per-partition sketches —
  * and therefore the merged candidate set — are exactly the ones the
  * exploded form produces (MisraGriesSpec pins ≡).
  *
  * Returns struct(cand array<string> sorted, n bigint): candidates AND
  * the total token count from the same single pass — the two numbers
  * [[MisraGries.fitSketch]] needs.
  */
case class MisraGriesTextExpr(child: Expression, k: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGTextBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("cand", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "misra_gries_text"

  override def createAggregationBuffer(): MGTextBuffer =
    new MGTextBuffer(new java.util.HashMap[String, Long](k * 2), 0L)

  private def mgStep(m: java.util.HashMap[String, Long], s: String): Unit = {
    val cur = m.getOrDefault(s, 0L)
    if (cur > 0L) m.put(s, cur + 1L)
    else if (m.size < k) m.put(s, 1L)
    else {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  override def update(b: MGTextBuffer, input: InternalRow): MGTextBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val len = s.length
      var i = 0
      while (i < len) {
        var j = s.indexOf(' ', i)
        if (j < 0) j = len
        if (j > i) { mgStep(b.m, s.substring(i, j)); b.total += 1L }
        i = j + 1
      }
    }
    b
  }

  override def merge(x: MGTextBuffer, y: MGTextBuffer): MGTextBuffer = {
    val m = x.m
    val it = y.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      m.put(e.getKey, m.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (m.size > k) {
      val counts = new Array[Long](m.size)
      var i = 0
      val vi = m.values().iterator()
      while (vi.hasNext) { counts(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - 1 - k)
      val ei = m.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= cut) ei.remove() else e.setValue(e.getValue - cut)
      }
    }
    x.total += y.total
    x
  }

  override def eval(b: MGTextBuffer): Any = {
    val keys = new Array[String](b.m.size)
    var i = 0
    val ki = b.m.keySet().iterator()
    while (ki.hasNext) { keys(i) = ki.next(); i += 1 }
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericInternalRow(Array[Any](
      new GenericArrayData(keys.map(UTF8String.fromString(_: String))), b.total))
  }

  override def serialize(b: MGTextBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.total)
    out.writeInt(b.m.size)
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGTextBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val total = in.readLong()
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
    new MGTextBuffer(m, total)
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesTextExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesTextExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesTextExpr = copy(child = c.head)
}

object MisraGriesTextExpr {
  /** `mgText(k)(textCol)` → struct(cand sorted array, n total tokens). */
  def apply(k: Int)(c: Column): Column =
    ColumnBridge.column(
      MisraGriesTextExpr(ColumnBridge.expression(c), k).toAggregateExpression())
}

/** Exact per-candidate token counts + the current corpus total in ONE
  * text pass: buffer = long[cand.size + 1] (last slot = total tokens).
  * This is the verify half of the certified heavy-hitters plan without
  * the explode + InSet-filtered string hash-agg — the exchange carries
  * one fixed-size long array per partition however large the corpus
  * (same bounded-exchange contract as the sketch half). Token slot
  * lookup is a frozen per-executor HashMap built once per task from
  * the broadcast expression.
  */
case class CandTokenCountsExpr(child: Expression, cand: Seq[String],
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cand_token_counts"

  @transient private lazy val slot: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](cand.size * 2)
    var i = 0
    cand.foreach { c => m.put(c, i); i += 1 }
    m
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](cand.size + 1)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val len = s.length
      var i = 0
      while (i < len) {
        var j = s.indexOf(' ', i)
        if (j < 0) j = len
        if (j > i) {
          val idx = slot.get(s.substring(i, j))
          if (idx != null) b(idx.intValue()) += 1L
          b(b.length - 1) += 1L
        }
        i = j + 1
      }
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(b.length * 8)
    b.foreach(out.putLong)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(in.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CandTokenCountsExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CandTokenCountsExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CandTokenCountsExpr = copy(child = c.head)
}

object CandTokenCountsExpr {
  def apply(cand: Seq[String])(c: Column): Column =
    ColumnBridge.column(
      CandTokenCountsExpr(ColumnBridge.expression(c), cand).toAggregateExpression())
}
