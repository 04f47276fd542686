package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering for multi-dimensional
  * range-query pruning — the lakehouse layout technique (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`) re-expressed with plain codegen'd Spark
  * functions.
  *
  * Why it matters at 100 TB: parquet row-group (and file) min/max
  * stats prune a scan only along the physical sort order. Sorting by
  * one column makes predicates on OTHER columns unprunable — every
  * row group's min/max for those spans the whole domain. Interleaving
  * the bits of k columns into one sort key bounds EVERY interleaved
  * column's spread within a run of rows, so a 2-D rectangle predicate
  * skips most row groups (verified by recordsRead in ZOrderSpec).
  *
  * The interleave is the classic magic-mask bit spread (5 shift/mask
  * ops per coordinate, no UDF, stays inside whole-stage codegen).
  * Scaling to the key domain is rank-free: callers pass (lo, hi)
  * bounds as Columns — typically from a tiny min/max aggregate
  * broadcast back into the plan — so the whole layout job is one scan
  * + one range shuffle, no driver collect of data rows.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` to even bit positions (Morton). */
  private def spread(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xffffffffL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000ffff0000ffffL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
    (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Map `c` in [lo, hi] onto the integer grid [0, 2^bits): the
    * per-coordinate quantization before interleaving. Values outside
    * the bounds clamp to the edge cells (stats stay correct — clamping
    * only affects placement, never the stored value).
    */
  def scaled(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val cells = lit((1L << bits) - 1)
    val span = greatest(hi.cast("double") - lo.cast("double"), lit(1e-300))
    val cell = floor((c.cast("double") - lo.cast("double")) / span *
      cells.cast("double")).cast("long")
    least(greatest(cell, lit(0L)), cells)
  }

  /** 2-D Morton key of two pre-quantized grid coordinates. */
  def zkey2(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** General k-D interleave (bit-at-a-time; use zkey2 for the common
    * 2-D case — same key, fewer expression nodes).
    */
  def zkey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits * cols.size <= 63,
      s"${cols.size} cols x $bits bits exceeds a long key")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)),
      i * cols.size + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` on the Morton key of two numeric columns and write
    * parquet: per-column min/max bounds come from one tiny aggregate
    * broadcast back into the plan (no driver collect), the range
    * shuffle splits the curve into `numFiles` contiguous segments, and
    * each segment is sorted so row-group stats are tight on BOTH
    * dimensions. `blockSize` tunes the parquet row-group size — the
    * pruning granule (small granule = finer skipping, more footer
    * overhead; default leaves parquet's 128 MB).
    */
  def clusterWrite2(df: DataFrame, c1: String, c2: String, path: String,
                    numFiles: Int, bits: Int = 16,
                    blockSize: Option[Int] = None): Unit = {
    val bounds = df.agg(
      min(col(c1)).as("__lo1"), max(col(c1)).as("__hi1"),
      min(col(c2)).as("__lo2"), max(col(c2)).as("__hi2"))
    val keyed = df.crossJoin(broadcast(bounds))
      .withColumn("__z", zkey2(
        scaled(col(c1), col("__lo1"), col("__hi1"), bits),
        scaled(col(c2), col("__lo2"), col("__hi2"), bits)))
      .drop("__lo1", "__hi1", "__lo2", "__hi2")
    val laid = keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    val w = laid.write.mode("overwrite")
    blockSize.fold(w)(b => w.option("parquet.block.size", b.toString))
      .parquet(path)
  }
}
