package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Elementwise vector sum + count: aggregates an `array<float>` column
  * into (sums: array<double>, n: long) WITHOUT exploding to
  * (pos, value) rows — the per-dimension centroid shape (q88) at a
  * fraction of the row traffic: n·d exploded rows through a hash
  * aggregate become n fused 64-lane adds into a per-group buffer, and
  * the exchange carries one d-array per (group × partition) instead of
  * d rows per (group × partition).
  *
  * Mergeable (partial aggregation works); null/empty arrays are
  * skipped. Per-dimension addition order is (partition-local fold) →
  * (merge tree) — the same class of reordering any distributed double
  * sum has; consumers needing cross-engine hash equality must apply the
  * same rounding discipline as the exploded formulation (Num.rnd 6dp
  * on the final mean).
  */
class VecSumAgg(dim: Int)
    extends Aggregator[Option[Seq[Float]], (Array[Double], Long), (Seq[Double], Long)] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long),
                      a: Option[Seq[Float]]): (Array[Double], Long) = a match {
    case Some(v) if v != null && v.length == dim =>
      val buf = b._1
      var i = 0
      while (i < dim) { buf(i) += v(i).toDouble; i += 1 }
      (buf, b._2 + 1L)
    case _ => b
  }

  override def merge(x: (Array[Double], Long),
                     y: (Array[Double], Long)): (Array[Double], Long) = {
    val buf = x._1
    var i = 0
    while (i < dim) { buf(i) += y._1(i); i += 1 }
    (buf, x._2 + y._2)
  }

  override def finish(r: (Array[Double], Long)): (Seq[Double], Long) =
    (r._1.toSeq, r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[(Seq[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Long)]()
}

object VecSumAgg {
  /** `vecSum(dim)(embeddingCol)` → struct(_1: array<double>, _2: long). */
  def apply(dim: Int)(c: Column): Column = udaf(new VecSumAgg(dim)).apply(c)
}
