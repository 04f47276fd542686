package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) on a DIRECTED bipartite
  * graph — the mutual-reinforcement ranking beside [[PageRank]]'s
  * random-walk one (hub customers "endorse" authority suppliers and
  * vice versa; in a curation pipeline this ranks crawl sources against
  * the documents they link).
  *
  * Same fixed-point integer discipline as PageRank: scores are
  * Scale-scaled longs; each half-iteration is one hash join + one
  * partial-agg groupBy (exact long sums, order-independent), and the
  * normalization `x·Scale/Σx` is computed as `x div (Σx div Scale)` —
  * pure integer ops a SQL oracle replays to the unit.  Per-iteration
  * normalization keeps every score ≤ ~Scale, so the sums stay inside
  * long range for vertex counts up to ~10^6 per side at the default
  * Scale (drop Scale for larger graphs).
  */
object Hits {

  val Scale: Long = PageRank.Scale

  /** Returns (id, side['hub'|'auth'], score) after `iters` rounds. */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int): DataFrame = {
    require(iters >= 1, "at least one iteration")
    Iterative.withAqeOff(edges) { edges =>
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val hubs0 = e.select(col("src").as("id")).distinct()
    val nH = hubs0.count()
    val hub0 = hubs0.select(col("id"), lit(Scale / nH).as("h")).persist()
    var hub: DataFrame = hub0
    var auth: DataFrame = null
    var prevH: DataFrame = null
    var prevA: DataFrame = null
    for (_ <- 1 to iters) {
      // Persist the two raw-sum frames per iteration (each is read
      // twice: by its normalizer aggregate and by the next half-step);
      // the normalized frames are cheap single-use projections on top.
      // ONE count() barrier per iteration (on hRaw — computing it
      // pulls aRaw through its cache too) keeps lineage flat before
      // the previous iteration's caches are dropped: unpersisting a
      // parent of a still-lazy cache would silently re-expand the
      // whole join chain on first use.
      val aRaw = e.join(hub, e("src") === hub("id"))
        .groupBy(e("dst").as("id")).agg(sum(col("h")).as("raw"))
        .persist()
      val aDiv = aRaw.agg(expr(s"sum(raw) div ${Scale}L").as("d"))
      val nextA = aRaw.crossJoin(broadcast(aDiv))
        .select(col("id"), expr("raw div greatest(d, 1L)").as("a"))
      val hRaw = e.join(nextA, e("dst") === nextA("id"))
        .groupBy(e("src").as("id")).agg(sum(col("a")).as("raw"))
        .persist()
      hRaw.count()
      val hDiv = hRaw.agg(expr(s"sum(raw) div ${Scale}L").as("d"))
      val nextH = hRaw.crossJoin(broadcast(hDiv))
        .select(col("id"), expr("raw div greatest(d, 1L)").as("h"))
      if (prevA != null) prevA.unpersist(blocking = false)
      if (prevH != null) prevH.unpersist(blocking = false)
      prevA = aRaw
      prevH = hRaw
      hub = nextH
      auth = nextA
    }
    // materialize-and-release (r11): result checkpointed, every cache
    // this call created released — repeated calls accumulate nothing.
    val result = hub.select(col("id"), lit("hub").as("side"), col("h").as("score"))
      .unionByName(auth.select(col("id"), lit("auth").as("side"),
        col("a").as("score")))
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    hub0.unpersist(blocking = false)
    if (prevA != null) prevA.unpersist(blocking = false)
    if (prevH != null) prevH.unpersist(blocking = false)
    result
    }
  }
}
