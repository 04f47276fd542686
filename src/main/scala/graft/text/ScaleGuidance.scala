package graft.text

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame

/** Discoverable scale guidance for operators whose OUTPUT is inherently
  * quadratic in corpus duplication (the exact near-dup twins): the
  * right default below ~10⁷ docs, the wrong tool at 100 TB — where the
  * bounded paths (MinHash+LSH q55/q166, prefix-filter q138, SimHash
  * q56) compute the same decision. The hook fires from the operator
  * itself, so a user learns the 100 TB route from the code path they
  * are already on, not from release notes.
  *
  * The size estimate is Catalyst's plan statistic (`stats.sizeInBytes`,
  * file-size-derived for parquet scans) — read at PLAN BUILD time,
  * zero extra jobs on the hot path. Threshold is tunable/disable-able
  * via `spark.graft.exactPairs.warnBytes` (default 1 GiB; set huge to
  * silence).
  */
object ScaleGuidance {

  val WarnBytesConf = "spark.graft.exactPairs.warnBytes"
  private val DefaultWarnBytes = 1L << 30

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Last emitted guidance, for tests/observability. */
  val last = new AtomicReference[String](null)

  def checkExactPairs(input: DataFrame, op: String): Unit = {
    val limit = input.sparkSession.conf
      .get(WarnBytesConf, DefaultWarnBytes.toString).toLong
    val bytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes > limit) {
      val msg = s"$op enumerates EXACT near-duplicate pairs - output " +
        s"(and shuffle) grow quadratically with corpus duplication. " +
        s"Input estimated at $bytes bytes (> $WarnBytesConf=$limit). " +
        "At this scale use the bounded equivalents: MinHash.lshPairs " +
        "(q55_minhash_lsh) / the end-to-end LSH dedup (q166_minhash_dedup), " +
        "prefix-filtered exact pairs for t>=0.8 (q138), or SimHash (q56)."
      last.set(msg)
      log.warn(msg)
    }
  }
}
