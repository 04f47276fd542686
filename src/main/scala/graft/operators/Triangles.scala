package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree orientation (the
  * MapReduce-friendly formulation: Cohen 2009, Suri & Vassilvitskii
  * 2011).  Orient every undirected edge from its (degree, id)-smaller
  * endpoint; each triangle then has exactly ONE apex with two
  * out-edges, and per-node out-degree is O(sqrt E) — so the wedge
  * self-join can never fan out on a hub node, which is what makes the
  * shape safe at 100 TB (id-orientation leaves celebrity nodes with
  * quadratic wedge lists).
  *
  * The closure join picks its strategy from the edge count (already
  * needed by callers for reporting): an edge set that fits broadcasts
  * — the wedge stream then passes through one hash probe with no
  * shuffle or sort — otherwise shuffle-hash, whose per-partition build
  * side stays bounded.
  *
  * Reference analog: the reference has no graph operators; this is a
  * beyond-reference capability for relationship-shaped corpora.
  */
object Triangles {

  /** @param und0 undirected edge set with long columns (a, b), a < b,
    *             deduplicated; persisted by this call (reused 4x).
    * @param broadcastLimit edge count below which the closure join
    *             broadcasts (≈160MB at the 10M default); above it the
    *             wedge stream shuffles into a hash join.  Exposed for
    *             the spec's branch-differential test.
    * @return single-row DataFrame (n_nodes, n_edges, n_tri)
    */
  def count(und0: DataFrame, broadcastLimit: Long = 10000000L): DataFrame = {
    val und = und0.persist()
    try countImpl(und, broadcastLimit)
    finally und.unpersist(blocking = false)
  }

  /** Runs the triangle plan to completion (the result is one row — the
    * final agg is collected and returned as literals so the two caches
    * can be released before returning; repeated calls no longer
    * accumulate cached storage).
    */
  private def countImpl(und: DataFrame, broadcastLimit: Long): DataFrame = {
    val nEdges = und.count()
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(org.apache.spark.sql.functions.count(lit(1)).as("dg"))
    val dirE = und
      .join(deg.select(col("v").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("dg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db")
            || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
      .persist() // both sides of the wedge self-join
    val wedges = dirE.as("p").join(dirE.as("q"),
        col("p.u") === col("q.u") && col("p.w") < col("q.w"))
      .select(col("p.w").as("v1"), col("q.w").as("v2"))
    val closer = if (nEdges < broadcastLimit) broadcast(und)
                 else und.hint("shuffle_hash")
    val tri = wedges.join(closer,
        wedges("v1") === closer("a") && wedges("v2") === closer("b"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_tri"))
    val nn = deg.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_nodes"))
    val plan = nn.crossJoin(tri)
      .select(col("n_nodes"), lit(nEdges).as("n_edges"), col("n_tri"))
    val row = plan.collect() // exactly 1 row
    try plan.sparkSession.createDataFrame(
      java.util.Arrays.asList(row: _*), plan.schema)
    finally dirE.unpersist(blocking = false)
  }
}
