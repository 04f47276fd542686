package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join without a nested loop.
  *
  * Spark plans `l JOIN r ON l.k = r.k AND l.t BETWEEN r.lo AND r.hi` as
  * a ShuffledHashJoin/SortMergeJoin on `k` with the range as a post-join
  * filter — fine when `k` is selective, but a pure range join (or a
  * low-cardinality `k`) degenerates to per-key nested loops, and with
  * NO equi key Spark falls back to BroadcastNestedLoopJoin: the classic
  * scale-killer.
  *
  * The standard fix (used by every warehouse's range-join optimization):
  * BIN the domain. Each point row maps to one bin (`t div width`); each
  * interval explodes to the bins it covers (`lo div width .. hi div
  * width`). Equi-join on (keys, bin) — a plain hash shuffle — then
  * apply the exact range predicate. A (point, interval) match pair
  * meets in exactly ONE bin (the point's), so no dedup is needed.
  *
  * Shuffle volume: points × 1 + intervals × (span/width + 1) — choose
  * `width` near the typical interval span so intervals explode into
  * O(1) bins. Works at any scale where one bin's rows fit a task; skew
  * in a hot bin is AQE's skew-join case.
  */
object RangeJoin {

  /** @param points    left side, one row per point
    * @param intervals right side, [loCol, hiCol] inclusive bounds (long)
    * @param keys      extra equi-join keys present on both sides
    * @param tCol      the point column (long) on `points`
    * @param width     bin width in the same units
    * @param how       "inner" or "left_outer" (points without a match kept)
    */
  def binned(points: DataFrame, intervals: DataFrame, keys: Seq[String],
             tCol: String, loCol: String, hiCol: String,
             width: Long, how: String = "inner"): DataFrame = {
    require(width > 0, "bin width must be positive")
    val p = points.withColumn("__bin", floorDiv(col(tCol), width))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floorDiv(col(loCol), width), floorDiv(col(hiCol), width))))
    val inRange = col(tCol) >= col(loCol) && col(tCol) <= col(hiCol)
    val matched = p.join(iv, keys :+ "__bin", "inner").filter(inRange)
    val res = how match {
      case "inner" => matched
      case "left_outer" =>
        // Whether a point row matches is a pure function of its column
        // VALUES, so identical point rows share one match status: a
        // semi/anti join of `points` against the matched set on ALL
        // point columns is exact, preserves legitimately duplicate
        // unmatched rows, and never fabricates a NULL row for a point
        // that matched some interval but shared a bin with another.
        // Null-SAFE equality (<=>) is required: a matched point carrying
        // a NULL payload column must still equi-match its own copy in
        // `matched`, else it is emitted twice (matched + fake NULL row).
        // A point whose KEY is null never reaches `matched` at all, so
        // the anti join keeps it — correctly surfaced as unmatched.
        val pCols = points.columns.toSeq
        val pA = points.as("__rj_p")
        val mA = matched.select(pCols.map(col): _*).as("__rj_m")
        val antiCond = pCols.map(c =>
          col(s"__rj_p.`$c`") <=> col(s"__rj_m.`$c`")).reduce(_ && _)
        val unmatched = pA.join(mA, antiCond, "left_anti")
        val ivOnly = intervals.columns.filterNot(keys.contains)
        val ivTypes = intervals.schema.map(f => f.name -> f.dataType).toMap
        val withNulls = ivOnly.foldLeft(unmatched) { (d, c) =>
          d.withColumn(c, lit(null).cast(ivTypes(c)))
        }
        matched.drop("__bin").unionByName(withNulls)
      case other => throw new IllegalArgumentException(other)
    }
    res.drop("__bin")
  }

  /** Interval × interval OVERLAP join: pairs where
    * `[aLo,aHi] ∩ [bLo,bHi] ≠ ∅` (inclusive). Same binning idea, plus
    * the standard dedup-free trick: two overlapping intervals share
    * every bin their intersection covers, so the pair is kept ONLY in
    * the first such bin — the one containing `max(aLo, bLo)`. One hash
    * shuffle on (keys, bin), no distinct.
    */
  def overlapBinned(a: DataFrame, b: DataFrame, keys: Seq[String],
                    aLo: String, aHi: String, bLo: String, bHi: String,
                    width: Long): DataFrame = {
    require(width > 0, "bin width must be positive")
    val ax = a.withColumn("__bin",
      explode(sequence(floorDiv(col(aLo), width), floorDiv(col(aHi), width))))
    val bx = b.withColumn("__bin",
      explode(sequence(floorDiv(col(bLo), width), floorDiv(col(bHi), width))))
    ax.join(bx, keys :+ "__bin")
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__bin") === floorDiv(greatest(col(aLo), col(bLo)), width))
      .drop("__bin")
  }

  /** Band join: point × point pairs with `|a.t − b.t| ≤ eps` (the
    * time-alignment join of sensor fusion / log correlation) — `b`'s
    * points become `[t−eps, t+eps]` intervals and route through
    * [[binned]]; with `width = eps` each interval covers ≤ 3 bins.
    */
  def bandBinned(a: DataFrame, b: DataFrame, keys: Seq[String],
                 aT: String, bT: String, eps: Long,
                 how: String = "inner"): DataFrame = {
    require(eps > 0, "eps must be positive")
    val iv = b.withColumn("__lo", col(bT) - eps).withColumn("__hi", col(bT) + eps)
    binned(a, iv, keys, aT, "__lo", "__hi", width = eps, how = how)
      .drop("__lo", "__hi")
  }

  /** Exact floor division IN INTEGER SPACE: subtract the non-negative
    * remainder (floor — not truncation — for negative inputs), then
    * integral-divide the exact multiple. Never routes through a double
    * (`/` on longs is double division, unrepresentable above 2⁵³ —
    * nanosecond-scale timestamps ~1.7e18 would bin off-by-one at bin
    * boundaries and silently drop/duplicate matches).
    */
  private def floorDiv(c: Column, w: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val exact = (c - pmod(c, lit(w))).cast("long")
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(exact),
      ColumnBridge.expression(lit(w))))
  }
}
