package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.similarity.Similarity

/** Similarity search over the embeddings table (`array<float>`, 64-dim).
  * Oracles compute the identical double-precision formula with DuckDB
  * list lambdas, so results hash-match after Num.rnd rounding.
  */
object SimilarityQueries {

  /** DuckDB SQL fragment: sequential double dot product of two list
    * columns — mirrors Similarity.dot exactly.
    */
  private[queries] def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))"

  private[queries] def sqlCos(a: String, b: String): String =
    s"(${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"

  /** 6 deterministic ±1 hyperplanes over 64 dims (seed 42) — shared by
    * the Spark plan and (as inlined literals) the oracle SQL.
    */
  private val planes = Similarity.planeLiterals(6, 64)

  private def planeSql(p: Array[Double]): String =
    p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  /** bucket = 6-bit sign signature, identical formula both engines. */
  private def sqlBucket(vec: String): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${sqlDot(vec, planeSql(p))} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** `sqlCos` for sibling query files (q373's scaled-SemDeDup oracle). */
  private[queries] def sqlCosPub(a: String, b: String): String = sqlCos(a, b)

  /** `sqlDot` for sibling query files (q422's prefix coarse metric). */
  private[queries] def sqlDotPub(a: String, b: String): String = sqlDot(a, b)

  /** 32-bit sign signature with `Similarity.semDedupScaled`'s plane set
    * (seed 7) — the oracle-side twin of `signBits(vec, planeLiterals(32,
    * 64, 7))`.
    */
  private[queries] def sigSql32(vec: String): String = sigSql32At(vec, 7L)

  /** Seed-parameterized twin (banded tables use seeds 7+t — q379/q380). */
  private[queries] def sigSql32At(vec: String, seed: Long): String = {
    val p32 = Similarity.planeLiterals(32, 64, seed)
    p32.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${sqlDot(vec, planeSql(p))} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Oracle for q91: recompute the pretrained-centroid cell assignment,
    * probe list, and bucketed top-k with the same literals and the same
    * expression shapes as IVF.Model (dist2 = v·v − 2·v·c + |c|², argmin
    * by (d, j) struct order, probes = first nprobe of the d-sorted
    * cells).
    */
  private def cellStructs(vec: String): String = {
    val cents = graft.similarity.IVFCentroids.pretrained
    def litArr(c: Array[Double]): String = c.map(_.toString).mkString("[", ",", "]")
    def dist2(vec: String, j: Int): String = {
      val c = cents(j)
      val cn2 = c.map(x => x * x).sum
      s"(${sqlDot(vec, vec)} - 2.0*${sqlDot(vec, litArr(c))} + ${cn2})"
    }
    cents.indices.map(j => s"{'d': ${dist2(vec, j)}, 'j': $j}").mkString("[", ",", "]")
  }

  /** Pretrained-centroid cell assignment as SQL — shared by q91's oracle
    * and q165's streaming-refresh oracle.
    */
  private[queries] def ivfCellSql(vec: String): String =
    s"list_sort(${cellStructs(vec)})[1].j"

  /** First-`nprobe` nearest cells as SQL (q377's int8-IVF oracle). */
  private[queries] def ivfProbesSql(vec: String, nprobe: Int): String =
    s"list_transform(list_sort(${cellStructs(vec)})[1:$nprobe], s -> s.j)"

  private def ivfOracleSql: String = {
    s"""WITH c AS (SELECT vec_id AS vid, embedding AS cv,
            list_sort(${cellStructs("embedding")})[1].j AS cell
          FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS qv,
            list_transform(list_sort(${cellStructs("embedding")})[1:4], s -> s.j) AS probes
          FROM embeddings WHERE vec_id < 16),
        sims AS (SELECT q.qid, c.vid,
            round(${sqlCos("q.qv", "c.cv")} * 1e6) / 1e6 AS sim
          FROM q JOIN c ON list_contains(q.probes, c.cell) AND c.vid != q.qid)
        SELECT qid, vid, sim, rn FROM (
          SELECT qid, vid, sim,
            CAST(row_number() OVER (PARTITION BY qid
              ORDER BY sim DESC, vid ASC) AS BIGINT) AS rn
          FROM sims) WHERE rn <= 5"""
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // embedding-cosine near-dup pairs — EXACT, via the tiled all-pairs
    // layout with the per-tile primitive kernel (no CartesianProduct,
    // no pair-row expansion; see cosinePairsTiledKernel scaladoc).
    // kernel ≡ join-tiled ≡ crossJoin pinned in Round6Spec/SimilaritySpec.
    "q57_cosine_pairs" -> QueryDef(
      (s, d) => Similarity.cosinePairsTiledKernel(Tables.embeddings(s, d), 0.4),
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings)
             SELECT id1, id2, sim FROM (
               SELECT a.vec_id AS id1, b.vec_id AS id2,
                 round(${sqlCos("a.embedding", "b.embedding")} * 1e6) / 1e6 AS sim
               FROM e a, e b WHERE a.vec_id < b.vec_id)
             WHERE sim >= 0.4"""),
      headline = true),

    // brute-force cosine top-k for a query set: the ANN baseline.
    "q58_ann_brute" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(e.filter(col("vec_id") < 8), e, 5)
      },
      Some(s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
             c AS (SELECT vec_id, embedding FROM embeddings),
             sims AS (SELECT q.vec_id AS qid, c.vec_id AS vid,
               round(${sqlCos("q.embedding", "c.embedding")} * 1e6) / 1e6 AS sim
               FROM q, c WHERE c.vec_id != q.vec_id)
             SELECT qid, vid, sim, rn FROM (
               SELECT qid, vid, sim,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY sim DESC, vid ASC) AS BIGINT) AS rn
               FROM sims) WHERE rn <= 5"""),
      headline = true),

    // LSH-bucketed ANN: hyperplane sign buckets, join only within the
    // query's bucket — the 100 TB path (no corpus cross-join). Identical
    // deterministic hyperplanes inlined in the oracle.
    "q59_ann_lsh" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.lshTopK(e.filter(col("vec_id") < 32), e, 3, planes)
      },
      Some(s"""WITH b AS (SELECT vec_id, embedding, ${sqlBucket("embedding")} AS bucket
                        FROM embeddings),
             q AS (SELECT * FROM b WHERE vec_id < 32),
             sims AS (SELECT q.vec_id AS qid, c.vec_id AS vid,
               round(${sqlCos("q.embedding", "c.embedding")} * 1e6) / 1e6 AS sim
               FROM q JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.vec_id)
             SELECT qid, vid, sim, rn FROM (
               SELECT qid, vid, sim,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY sim DESC, vid ASC) AS BIGINT) AS rn
               FROM sims) WHERE rn <= 3""")),

    // IVF (coarse-quantized cell-partitioned) ANN — the second scale
    // path. The coarse quantizer is PRETRAINED (IVFCentroids: KMeans fit
    // offline, frozen literals — how production IVF trains on a sample
    // then assigns at any scale), so the oracle recomputes the identical
    // cell assignment, probe list, and top-k from the same literals,
    // exactly as q59 inlines its hyperplanes. The online KMeans path
    // (IVF.fit) is pinned by IVFSpec (recall@5 0.93 vs brute force).
    "q91_ann_ivf" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val model = graft.similarity.IVF.Model(graft.similarity.IVFCentroids.pretrained)
        graft.similarity.IVF.topK(e.filter(col("vec_id") < 16), e, model, 5, 4)
      },
      Some(ivfOracleSql)),

    // self-norm sanity surface for the vector math (dot in double).
    "q60_embed_norm" -> QueryDef(
      (s, d) => Tables.embeddings(s, d).select(
        col("vec_id"),
        graft.functions.Num.rnd(Similarity.norm(col("embedding")), 6).as("l2"),
        col("label")),
      Some(s"""SELECT vec_id,
             round(sqrt(${sqlDot("embedding", "embedding")}) * 1e6) / 1e6 AS l2,
             label
             FROM embeddings""")),

    // int8 affine quantization (embedding compression for storage/
    // serving): per-vector [min,max] range → codes = floor((x−mn)·255 /
    // (mx−mn)), clamped. Scan-stage transform/aggregate over the float
    // array — zero shuffles, zero UDFs; at 100 TB this is a pure
    // map-stage rewrite of the embedding column. Both engines evaluate
    // the IDENTICAL IEEE double expression (same op order), so floor
    // boundaries agree bit-for-bit; degenerate constant vectors code
    // to 0 (mx=mn guard both sides).
    "q188_embed_quantize" -> QueryDef(
      (s, d) => {
        val v = col("embedding")
        val mn = array_min(v).cast("double")
        val mx = array_max(v).cast("double")
        val codes = transform(v, x => when(mx > mn,
            least(lit(255L), floor(((x.cast("double") - mn) * 255.0) / (mx - mn)).cast("long")))
          .otherwise(0L))
        Tables.embeddings(s, d).select(col("vec_id"),
          graft.functions.Num.rnd(mn, 6).as("mn"),
          graft.functions.Num.rnd(mx, 6).as("mx"),
          aggregate(codes, lit(0L), (a, c) => a + c).as("code_sum"),
          array_min(codes).as("code_min"),
          array_max(codes).as("code_max"))
      },
      Some("""WITH q AS (SELECT vec_id,
               CAST(list_min(embedding) AS DOUBLE) AS mn,
               CAST(list_max(embedding) AS DOUBLE) AS mx,
               list_transform(embedding, x -> CASE
                 WHEN CAST(list_max(embedding) AS DOUBLE) > CAST(list_min(embedding) AS DOUBLE)
                 THEN least(255, CAST(floor(((CAST(x AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) * 255.0)
                   / (CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE))) AS BIGINT))
                 ELSE 0 END) AS codes
             FROM embeddings)
             SELECT vec_id,
               round(mn * 1e6) / 1e6 AS mn, round(mx * 1e6) / 1e6 AS mx,
               CAST(list_sum(codes) AS BIGINT) AS code_sum,
               CAST(list_min(codes) AS BIGINT) AS code_min,
               CAST(list_max(codes) AS BIGINT) AS code_max
             FROM q"""))
  )
}
