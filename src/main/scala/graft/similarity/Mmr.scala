package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998) diversity
  * selection: pick k items maximizing
  * `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)` greedily — the standard
  * recipe for building DIVERSE eval/few-shot sets from an embedding
  * corpus (pure relevance top-k returns near-duplicates of each other).
  *
  * Distributed shape: relevance and the top-`pool` shortlist are
  * computed distributed ([[Similarity.bruteForceTopK]] — or any ANN
  * path at scale); the greedy λ-tradeoff is inherently sequential, so
  * it runs on the DRIVER over the bounded pool (pool² ≤ 4096 sims for
  * pool=64 — the same bounded-certification pattern as Misra-Gries).
  * The driver arithmetic replays the engine's exact fold (sequential
  * float→double dot, norm = sqrt(self-dot), 6dp away-from-zero round),
  * so a SQL oracle reproduces the selection bit-for-bit.
  */
object Mmr {

  /** `round(x·10⁶)/10⁶` with away-from-zero .5 handling — the same
    * scale-0 rounding `Num.rnd` / DuckDB `round` apply.
    */
  def rnd6(x: Double): Double = {
    val s = x * 1e6
    (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)) / 1e6
  }

  private def dotD(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** dot/(‖a‖·‖b‖) with the identical association as
    * [[Similarity.cosine]] and the oracle's sqlCos.
    */
  def cosD(a: Array[Float], b: Array[Float]): Double =
    dotD(a, b) / (math.sqrt(dotD(a, a)) * math.sqrt(dotD(b, b)))

  /** MMR-select `k` of the top-`pool` most relevant to `queryId`.
    * Returns (vec_id, rel, rank).  `lambda` and `mu` are BOTH explicit
    * (not `1 − λ`: 1.0 − 0.7 is 0.30000000000000004 in doubles — the
    * oracle writes 0.3, so the caller must too).
    */
  def select(emb: DataFrame, queryId: Long, pool: Int, k: Int,
             lambda: Double, mu: Double): DataFrame = {
    require(k <= pool, "k must not exceed the shortlist pool")
    val spark = emb.sparkSession
    val ranked = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") === queryId), emb, pool)
      .select(col("vid"), col("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val vecs = emb.filter(col("vec_id").isin(ranked.map(_._1).toIndexedSeq: _*))
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val shortlist = ranked.map { case (id, rel) => (id, vecs(id), rel) }
    val remaining = collection.mutable.ArrayBuffer(shortlist: _*)
    val picked = collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
    val pickedVecs = collection.mutable.ArrayBuffer.empty[Array[Float]]
    (1 to k).foreach { rank =>
      val best = remaining.map { case (id, v, rel) =>
        val maxSim =
          if (pickedVecs.isEmpty) 0.0
          else pickedVecs.map(s => rnd6(cosD(v, s))).max
        (id, v, rel, lambda * rel - mu * maxSim)
      }.minBy { case (id, _, _, score) => (-score, id) }
      picked += ((best._1, best._3, rank.toLong))
      pickedVecs += best._2
      remaining.filterInPlace(_._1 != best._1)
    }
    import spark.implicits._
    picked.toSeq.toDF("vec_id", "rel", "rank")
  }
}
