package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mutable buffer for [[VecSumExpr]]: elementwise running sums + row
  * count (one flat primitive array — no per-row allocation).
  */
final class VecSumBuffer(val sums: Array[Double], var n: Long)

/** Native elementwise vector-sum aggregate: `array<float|double>` →
  * struct(sums array<double>, n bigint), reading `ArrayData` slots
  * directly — no encoder, no per-element boxing, no exploded rows.
  *
  * This is the hot path for per-group centroids over embedding columns
  * (q88 shape): the udaf twin [[VecSumAgg]] pays an
  * InternalRow→Option[Seq[Float]] conversion per input row (boxing
  * every element — the same element count the posexplode formulation
  * pushes through the hash aggregate); this one does `dim` primitive
  * adds per row. Differential spec pins this ≡ the udaf twin exactly.
  *
  * Rows whose array is null or not exactly `dim` long are skipped
  * (same contract as the twin). Addition order per dimension is
  * partition-fold + merge-tree like any distributed double sum —
  * consumers round before cross-engine compares.
  */
case class VecSumExpr(child: Expression, dim: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumBuffer] {

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DoubleType, containsNull = false)),
    StructField("n", LongType)))
  override def prettyName: String = "vec_sum"

  override def createAggregationBuffer(): VecSumBuffer =
    new VecSumBuffer(new Array[Double](dim), 0L)

  override def update(b: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        val s = b.sums
        var i = 0
        if (isFloat) while (i < dim) { s(i) += arr.getFloat(i); i += 1 }
        else while (i < dim) { s(i) += arr.getDouble(i); i += 1 }
        b.n += 1L
      }
    }
    b
  }

  override def merge(x: VecSumBuffer, y: VecSumBuffer): VecSumBuffer = {
    val (s, t) = (x.sums, y.sums)
    var i = 0
    while (i < dim) { s(i) += t(i); i += 1 }
    x.n += y.n
    x
  }

  override def eval(b: VecSumBuffer): Any =
    InternalRow(new GenericArrayData(b.sums.clone()), b.n)

  override def serialize(b: VecSumBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * dim + 8)
    var i = 0
    while (i < dim) { bb.putDouble(b.sums(i)); i += 1 }
    bb.putLong(b.n)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new Array[Double](dim)
    var i = 0
    while (i < dim) { s(i) = bb.getDouble(); i += 1 }
    new VecSumBuffer(s, bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): VecSumExpr = copy(child = c.head)
}

object VecSumExpr {
  /** `vecSum(dim)(embeddingCol)` → struct(sums: array<double>, n). */
  def apply(dim: Int)(c: Column): Column =
    ColumnBridge.column(
      VecSumExpr(ColumnBridge.expression(c), dim).toAggregateExpression())
}
