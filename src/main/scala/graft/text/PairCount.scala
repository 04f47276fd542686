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

  private def startDrain(): Unit = { drainIdx = 0 }

  override def hasNext: Boolean = {
    // serving a drain?
    while (drainIdx < CAP && keys(drainIdx) == -1L) drainIdx += 1
    if (drainIdx < CAP) return true
    if (drainIdx == CAP && nLive > 0 && !input.hasNext) {
      // input exhausted: final drain
      startDrain()
      while (drainIdx < CAP && keys(drainIdx) == -1L) drainIdx += 1
      return drainIdx < CAP
    }
    // consume input until the map fills or input ends
    while (input.hasNext) {
      val ds = input.next()
      val n = ds.length
      var i = 0
      while (i < n) {
        val a = ds(i)
        var j = i + 1
        while (j < n) {
          add((a << 32) | (ds(j) & 0xffffffffL))
          j += 1
        }
        i += 1
      }
      if (nLive >= LIMIT) {
        startDrain()
        while (drainIdx < CAP && keys(drainIdx) == -1L) drainIdx += 1
        return drainIdx < CAP
      }
    }
    if (nLive > 0) {
      startDrain()
      while (drainIdx < CAP && keys(drainIdx) == -1L) drainIdx += 1
      drainIdx < CAP
    } else false
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
