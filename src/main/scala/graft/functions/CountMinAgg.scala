package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) as a typed
  * mergeable [[Aggregator]] — the point-query frequency sketch beside
  * the engine's KMV (distinct), HLL (approx_count_distinct) and
  * Misra-Gries (heavy hitters) summaries.
  *
  * Distributed shape: the buffer is a CONSTANT d×w counter grid
  * (default 4×256 longs) that partial-aggregates map-side and merges by
  * elementwise add, so the exchange carries one ~8 KB grid per
  * (partition, group) regardless of input size — frequency estimates
  * for any later probe key without a second scan of the data.
  * estimate(k) = min_d grid[d][bucket_d(k)] ≥ true count, with the
  * classic (ε=e/w, δ=e^−d) overestimate bound.
  *
  * Buckets are md5-derived (seed-prefixed, first 8 hex chars mod w) —
  * deterministic and replayable in SQL on both engines, which is what
  * lets the oracle rebuild the identical grid (q258). Hashing stays in
  * codegen'd Catalyst expressions ([[CountMin.buckets]]); the
  * Aggregator only increments d slots per row.
  */
class CountMinAgg(d: Int, w: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], bs: Seq[Long]): Array[Long] = {
    if (bs != null) {
      var i = 0
      while (i < d) { buf(i * w + bs(i).toInt) += 1L; i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object CountMin {
  /** Default grid: 4 rows × 256 buckets (ε ≈ 1.1%, δ ≈ 1.8%). */
  val D = 4
  val W = 256

  /** Bucket of `key` (string column) under hash row `seed`: first 8 hex
    * chars of a seed-prefixed md5, mod w — same cross-engine hash
    * discipline as q139/q148's samplers.
    */
  def bucket(seed: Int, key: Column, w: Int = W): Column =
    conv(substring(md5(concat(lit(s"cms$seed:"), key)), 1, 8), 16, 10)
      .cast("long") % w

  /** All d bucket indices of a key, as one array column (codegen'd). */
  def buckets(key: Column, d: Int = D, w: Int = W): Column =
    array((0 until d).map(bucket(_, key, w)): _*)

  /** Aggregate a buckets column into the flattened d×w grid. */
  def sketch(bucketsCol: Column, d: Int = D, w: Int = W): Column =
    udaf(new CountMinAgg(d, w), ExpressionEncoder[Seq[Long]]()).apply(bucketsCol)

  /** Point-query estimate of `key` against a sketch column (the 1-based
    * element_at walk over the flattened grid; min across the d rows).
    */
  def estimate(sketchCol: Column, key: Column, d: Int = D, w: Int = W): Column = {
    val ests = (0 until d).map { r =>
      element_at(sketchCol, (lit(r * w) + bucket(r, key, w) + lit(1)).cast("int"))
    }
    least(ests: _*)
  }

  /** Equi-join SIZE estimate from two sketches over the same key
    * domain: |A ⋈ B| ≈ min_d Σ_j A[d][j]·B[d][j] (Cormode &
    * Muthukrishnan 2005 §4.2 — the sketch inner product never
    * underestimates and carries the same ε·|A|·|B| overestimate
    * bound).  Exact long arithmetic, computed per row of a
    * one-row crossJoin of the two broadcast sketches.
    */
  def joinSizeEstimate(skA: Column, skB: Column, d: Int = D, w: Int = W): Column = {
    val rows = (0 until d).map { r =>
      aggregate(sequence(lit(0), lit(w - 1)), lit(0L), (acc, j) => {
        val idx = (lit(r * w) + j + lit(1)).cast("int")
        acc + element_at(skA, idx) * element_at(skB, idx)
      })
    }
    least(rows: _*)
  }
}
