package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection beside [[Components]] (which finds *connectivity*; LPA
  * finds *density* structure, the signal used to group near-duplicate
  * crawl domains).  Deterministic variant: each iteration every vertex
  * adopts the most frequent label among its neighbors, ties broken by
  * the SMALLEST label — so results are reproducible across partitions
  * and replayable in a SQL oracle (classic LPA breaks ties randomly).
  *
  * Distributed shape: one hash join (labels ⋈ edges) + one two-key
  * partial-agg groupBy + one per-vertex arg-max per iteration — the
  * same bounded pattern as [[PageRank]]; iteration count is a constant,
  * lineage is cut by persist.  The arg-max window runs on the already
  * clustered-by-vertex aggregate (no extra exchange beyond the
  * groupBy's own).
  */
object LabelProp {

  /** `edges(srcCol, dstCol)` is symmetrized + deduped; initial label of
    * a vertex is its own id.  Returns (id, label) after `iters` rounds.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int): DataFrame = {
    require(iters >= 1, "at least one iteration")
    Iterative.withAqeOff(edges) { edges =>
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true) // edges referenced twice (r11, see PageRank.run)
    // size-derived loop width (r14, see Iterative.layoutParts /
    // Components): AQE is off here, so the conf default would otherwise
    // fix every round's stage width regardless of graph size
    e0.sparkSession.conf.set("spark.sql.shuffle.partitions",
      Iterative.layoutParts(e0.sparkSession, e0.count()).toString)
    val sym = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var lab = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val votes = sym.join(lab, sym("src") === lab("id"))
        .groupBy(col("dst").as("vid"), col("label"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("vid").orderBy(col("n").desc, col("label").asc)
      val next = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vid").as("id"), col("label"))
        .persist()
      next.count()
      if (prev != null) prev.unpersist(blocking = false)
      prev = lab
      lab = next
    }
    // materialize-and-release (r11): same ownership rule as PageRank
    val result = lab.localCheckpoint(true)
    sym.unpersist(blocking = false)
    if (prev != null) prev.unpersist(blocking = false)
    lab.unpersist(blocking = false)
    result
    }
  }
}
