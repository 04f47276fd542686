package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Token n-gram shingling — the unit of near-duplicate detection.
  *
  * `shingles(text, 3)` produces the distinct set of 3-token windows.
  * Pure array expressions (transform/slice/concat_ws): the shingle set is
  * computed inside the scan stage, never materialized to a shuffle unless
  * an operator downstream needs it.
  */
object Shingles {

  /** Shared cached per-doc shingle-set projection for the near-dup
    * family (q54 inverted index, q55 LSH + verify, their composites).
    *
    * One definition so every caller builds the IDENTICAL plan and
    * CacheBridge.cacheIfAbsent shares a single in-memory entry.
    * r13 perf shape (opt guide §2.4/§6):
    *   - widened to machine parallelism BEFORE the shingle kernel when
    *     the scan is narrower than half the cores (same rule as
    *     Tables.fanout; a single gated-SF parquet split otherwise runs
    *     the tokenizing kernel — and every later cache read — on ONE
    *     task; at scale splits ≥ cores and this is a no-op);
    *   - the set SIZE is cached as its own column: the cache is
    *     columnar, so the size-only consumers (q54's two broadcast
    *     `sizes` builds) no longer deserialize the full string arrays.
    */
  def cachedSets(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val cores = docs.sparkSession.sparkContext.defaultParallelism
    // Width from optimizer statistics, NOT docs.rdd.getNumPartitions
    // (r14, ADVICE r13): touching .rdd under AQE finalizes the adaptive
    // plan — for any input containing a shuffle that materializes query
    // stages (real jobs) at plan-build time. Scan stats are file bytes,
    // so splits is the same number Tables.fanout derives; pure driver
    // planning, no job, for ANY input shape.
    val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      docs.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    val bytes = docs.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
      .queryExecution.optimizedPlan.stats.sizeInBytes
    val splits = (bytes / maxPart).min(BigInt(Int.MaxValue)).toLong.max(1L)
    // size-derived width capped at machine width — same rule and
    // rationale as Tables.fanout (r14): ~32 KB input bytes per task
    val width = (bytes / 32768).min(cores).max(1).toInt
    val wide = if (splits * 2 < width) docs.repartition(width) else docs
    wide.select(col(idCol), shingles(col(textCol), n).as("sh"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("sh")))
      .transform(org.apache.spark.sql.graftbridge.CacheBridge.cacheIfAbsent)
  }

  /** Native one-pass expression ([[ShingleSet]]); the composed
    * array-lambda form below documents the exact semantics and pins them
    * in TextSpec.
    */
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(text), n))
  }

  /** Reference formulation of [[shingles]] out of composed array
    * expressions — interpreted (higher-order functions don't codegen),
    * kept as the differential-testing twin of the native expression.
    */
  def shinglesComposed(text: Column, n: Int): Column = {
    // Empty tokens (runs of whitespace) are not shingle material — a
    // whitespace-only doc must yield the empty set, not shingles of "".
    val t = filter(TextStats.tokens(text), x => x =!= "")
    // Documents with < n tokens have no n-gram window at all. Without the
    // guard, sequence(0, size-n) with size<n produces a DESCENDING sequence
    // (Spark defaults step to -1 when stop < start) and slice() then throws
    // INVALID_PARAMETER_VALUE.START on the negative index.
    when(size(t) < n, array().cast("array<string>")).otherwise(
      array_distinct(
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n))))))
  }

  /** Exact Jaccard similarity of two shingle-set columns. Two empty sets
    * are defined as similarity 0 (never a near-duplicate pair), avoiding
    * the 0/0 null.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - inter
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }
}
