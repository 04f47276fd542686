package graft.text

/** Streaming per-partition pair counter for the inverted-index near-dup
  * pipeline: consumes sorted doc-id lists (one per shingle), counts
  * every packed (id1<<32 | id2) pair in a PRIMITIVE open-addressed map,
  * and emits (pk, partialCount) chunks whenever the map fills — bounded
  * memory (2 × 2²¹ longs = 32 MB per task) no matter how many pair
  * emissions the partition generates. Downstream `groupBy(pk).sum`
  * restores exact totals from the partials, so this is the identical
  * dataflow to the explode+hashagg twin (pinned in Round6Spec) minus
  * one materialized row PER PAIR EMISSION — the stage that produces
  * ~10⁸ rows on the 10×-cloned smoke corpus.
  *
  * Keys are non-negative (doc ids < 2³¹), so -1 is a free slot
  * sentinel. Fixed capacity, flush-at-half-load — no rehashing.
  */
final class PairCountIterator(input: Iterator[Seq[Long]])
    extends Iterator[(Long, Long)] {

  private val CAP = 1 << 21
  private val MASK = CAP - 1
  private val LIMIT = CAP / 2
  private val keys = new Array[Long](CAP)
  private val vals = new Array[Long](CAP)
  java.util.Arrays.fill(keys, -1L)
  private var nLive = 0
  private var drainIdx = CAP // > MASK means "not draining"

  // Pair generation SUSPENDS mid-list when the map reaches LIMIT and
  // resumes after the drain: a single hot shingle shared by thousands
  // of docs emits O(n²) pairs from ONE list, which would otherwise
  // saturate the fixed-capacity table between the per-list flush
  // checks and spin add()'s probe loop forever (a 100%-full open
  // table has no free slot). LIMIT-at-half-load + a check after every
  // single add() keeps nLive < CAP unconditionally.
  private var cur: Array[Long] = null
  private var ci = 0
  private var cj = 0

  private def add(pk: Long): Unit = {
    var h = pk * -0x61c8864680b583ebL // golden-ratio mix
    h ^= h >>> 32
    var i = h.toInt & MASK
    while (true) {
      val k = keys(i)
      if (k == pk) { vals(i) += 1L; return }
      if (k == -1L) { keys(i) = pk; vals(i) = 1L; nLive += 1; return }
      i = (i + 1) & MASK
    }
  }

  /** Emit pairs from `cur` starting at saved (ci, cj); returns true if
    * the map hit LIMIT (position saved for resume), false when the
    * list is exhausted. */
  private def fillFromCur(): Boolean = {
    val ds = cur
    val n = ds.length
    while (ci < n) {
      val a = ds(ci)
      while (cj < n) {
        add((a << 32) | (ds(cj) & 0xffffffffL))
        cj += 1
        if (nLive >= LIMIT) return true
      }
      ci += 1
      cj = ci + 1
    }
    cur = null
    false
  }

  private def beginDrain(): Boolean = {
    drainIdx = 0
    while (drainIdx < CAP && keys(drainIdx) == -1L) drainIdx += 1
    drainIdx < CAP
  }

  override def hasNext: Boolean = {
    // serving a drain?
    while (drainIdx < CAP && keys(drainIdx) == -1L) drainIdx += 1
    if (drainIdx < CAP) return true
    // fill until the map hits LIMIT or input ends
    while (true) {
      if (cur != null) {
        if (fillFromCur()) return beginDrain()
      } else if (input.hasNext) {
        cur = input.next().toArray
        ci = 0; cj = 1
      } else {
        return nLive > 0 && beginDrain() // final drain (or empty)
      }
    }
    false // unreachable
  }

  override def next(): (Long, Long) = {
    if (!hasNext) throw new NoSuchElementException
    val out = (keys(drainIdx), vals(drainIdx))
    keys(drainIdx) = -1L
    nLive -= 1
    drainIdx += 1
    if (nLive == 0) drainIdx = CAP // drain complete; back to fill mode
    out
  }
}
