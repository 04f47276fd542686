package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.{CountMin, Num}
import graft.similarity.{Pca, PcaComponents}

/** Round-15 additions: streaming as-of join, PCA embedding projection
  * (frozen model), and the leakage-safe group-level train/test split.
  */
object Round15Queries {

  /** DuckDB literal for a double array. */
  private def litArr(a: Array[Double]): String =
    a.map(_.toString).mkString("[", ",", "]")

  private val pcaModel =
    Pca.Model(PcaComponents.mean, PcaComponents.eigenvalues, PcaComponents.components)

  /** Oracle SQL for the PCA projection: the identical
    * `dot(x, w_d) − ⟨mean, w_d⟩` arithmetic from the same frozen
    * literals (meanDots inlined as the exact double constant Spark
    * subtracts — both engines then compute one float→double dot fold
    * and one subtraction, in the same order).
    */
  private def pcaOracleSql: String = {
    val cols = pcaModel.components.indices.map { d =>
      val w = litArr(pcaModel.components(d))
      val c = pcaModel.meanDots(d)
      s"round((${SimilarityQueries.sqlDot("embedding", w)} - ($c)) * 1e6) / 1e6 AS p$d"
    }.mkString(", ")
    s"SELECT vec_id, label, $cols FROM embeddings"
  }

  private def rateHex(r: Double): String = {
    require(r > 0 && r < 1, "rate in (0,1)")
    val t = (BigDecimal(BigInt(1) << 64) * r).toBigInt
    String.format("%016x", t.bigInteger)
  }

  private val trainHex = rateHex(0.8)

  val defs: Seq[(String, QueryDef)] = Seq(

    // §2.10 STREAMING as-of join (flatMapGroupsWithState; the
    // unbounded-source twin of q78's merge_asof backward+tolerance):
    // every purchase left-outer matched with the same user's most
    // recent click within 10 minutes; per-user state holds only the
    // clicks inside the tolerance horizon (watermark-evicted). Bounded
    // replay ⇒ equals the batch asof, which the oracle replays
    // (ties: latest click time, then largest event_id).
    "q255_stream_asof_join" -> QueryDef(
      (s, d) => graft.streaming.EventStreams.asofStreaming(s, d, 10),
      Some("""WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS pt
                FROM events WHERE event_type = 'purchase'),
              c AS (SELECT event_id AS c_id, user_id, epoch_us(ts) AS ct, value
                FROM events WHERE event_type = 'click'),
              m AS (SELECT p.p_id, c.c_id, c.value,
                      row_number() OVER (PARTITION BY p.p_id
                        ORDER BY c.ct DESC, c.c_id DESC) AS rn
                    FROM p JOIN c ON p.user_id = c.user_id
                      AND c.ct <= p.pt AND p.pt - c.ct <= 600000000)
              SELECT p.p_id, p.user_id, m.c_id, m.value AS c_value
              FROM p LEFT JOIN m ON p.p_id = m.p_id AND m.rn = 1""")),

    // §2.12 PCA projection of the embedding column (frozen k=8 model —
    // PcaComponents, fit by the one-pass Gram + driver-Jacobi path
    // pinned in PcaSpec): pure scan-stage map through the native dot
    // kernel, zero shuffles — the standard dimensionality reduction in
    // front of ANN indexing at scale.
    "q256_embed_pca" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val proj = Pca.projectCols(col("embedding"), pcaModel).zipWithIndex
          .map { case (c, i) => Num.rnd(c, 6).as(s"p$i") }
        e.select(Seq(col("vec_id"), col("label")) ++ proj: _*)
      },
      Some(pcaOracleSql)),

    // §2.12 leakage-safe GROUP-level train/test split: the hash salt is
    // the GROUP key (source), not the row id, so every document of a
    // source lands in the same split — the split discipline that keeps
    // near-duplicate documents from straddling train/test. Compare
    // q148 (row-level). Deterministic md5-uniform rate, stable under
    // repartitioning; oracle replays the identical hex threshold.
    "q257_group_split" -> QueryDef(
      (s, d) => {
        val u = substring(md5(concat(lit("gsplit:"), col("source"))), 1, 16)
        Tables.documents(s, d)
          .withColumn("split", when(u < lit(trainHex), "train").otherwise("test"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
      },
      Some(s"""SELECT CASE WHEN substr(md5('gsplit:' || source), 1, 16)
                      < '$trainHex' THEN 'train' ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
             FROM documents GROUP BY 1""")),

    // §2.12 Count-Min frequency sketch (functions/CountMinAgg): the
    // mergeable point-query frequency summary beside KMV/HLL/
    // Misra-Gries. The 4×256 grid partial-aggregates map-side (one
    // constant ~8 KB buffer per partition crosses the exchange — never
    // the keys); estimates for every user then come off the broadcast
    // sketch without rescanning. The oracle rebuilds the identical grid
    // from the same md5 buckets and replays min-across-rows; `exact`
    // rides along so the ≥-overestimate contract is visible in the
    // result itself.
    "q258_cms_freq" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.functions.broadcast
        val ev = Tables.events(s, d)
          .select(col("user_id").cast("string").as("k"))
        val sk = ev.select(CountMin.buckets(col("k")).as("bs"))
          .agg(CountMin.sketch(col("bs")).as("sk"))
        val probes = ev.groupBy("k").agg(count(lit(1)).as("exact"))
        probes.crossJoin(broadcast(sk))
          .select(col("k").cast("long").as("user_id"), col("exact"),
            CountMin.estimate(col("sk"), col("k")).as("est"))
      },
      Some(cmsOracleSql)),

    // §2.12 PCA-prefiltered ANN with exact rerank: pair scan in the
    // 8-dim projected space (8 multiplies/pair vs 64), GroupTopK
    // bounded heaps shortlist 32/query below the exchange, exact
    // squared-L2 rerank touches only |Q|·32 re-fetched vectors. The
    // third coarse-then-refine ANN family beside IVF (q91) and IVF-PQ
    // rerank (q242), with the PCA subspace as the coarse metric.
    "q259_ann_pca_rerank" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Pca.rerankTopK(e.filter(col("vec_id") < 16), e, pcaModel,
          k = 5, shortlist = 32)
      },
      Some(pcaRerankOracleSql(k = 5, shortlist = 32))))

  /** Oracle for q258: rebuild the 4×256 grid with the same md5 buckets
    * (counter value = total rows hashing there), then estimate =
    * least across the 4 rows.
    */
  private[queries] def cmsOracleSql: String = {
    val d = CountMin.D
    val w = CountMin.W
    def bSql(seed: Int) =
      s"CAST('0x' || substr(md5('cms$seed:' || k), 1, 8) AS BIGINT) % $w"
    val hCols = (0 until d).map(r => s"${bSql(r)} AS b$r").mkString(", ")
    val cCtes = (0 until d).map(r =>
      s"c$r AS (SELECT b$r AS b, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY 1)")
      .mkString(", ")
    val joins = (0 until d).map(r => s"JOIN c$r ON p.b$r = c$r.b").mkString(" ")
    val ests = (0 until d).map(r => s"c$r.n").mkString(", ")
    val pb = (0 until d).map(r => s"min(b$r) AS b$r").mkString(", ")
    s"""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
       h AS (SELECT k, $hCols FROM ev),
       $cCtes,
       p AS (SELECT k, CAST(count(*) AS BIGINT) AS exact, $pb FROM h GROUP BY k)
       SELECT CAST(p.k AS BIGINT) AS user_id, p.exact, least($ests) AS est
       FROM p $joins"""
  }

  /** Oracle for q259: identical projection literals, shortlist by
    * rounded projected L2, exact rerank — same fold shapes as
    * Pca.rerankTopK.
    */
  private def pcaRerankOracleSql(k: Int, shortlist: Int): String = {
    def pList(vec: String): String =
      pcaModel.components.indices.map { dd =>
        val wl = litArr(pcaModel.components(dd))
        s"(${SimilarityQueries.sqlDot(vec, wl)} - (${pcaModel.meanDots(dd)}))"
      }.mkString("[", ", ", "]")
    def dist2(a: String, b: String): String =
      s"(${SimilarityQueries.sqlDot(a, a)} - 2.0*${SimilarityQueries.sqlDot(a, b)} + ${SimilarityQueries.sqlDot(b, b)})"
    s"""WITH pc AS (SELECT vec_id AS vid, embedding AS cv, ${pList("embedding")} AS cp
             FROM embeddings),
         pq AS (SELECT vec_id AS qid, embedding AS qv, ${pList("embedding")} AS qp
             FROM embeddings WHERE vec_id < 16),
         cand AS (SELECT q.qid, c.vid, q.qv, c.cv,
             round(${dist2("q.qp", "c.cp")} * 1e6) / 1e6 AS d8
           FROM pc c, pq q WHERE c.vid != q.qid),
         short AS (SELECT qid, vid, qv, cv FROM (
             SELECT qid, vid, qv, cv,
               row_number() OVER (PARTITION BY qid ORDER BY d8 ASC, vid ASC) AS srn
             FROM cand) WHERE srn <= $shortlist),
         ex AS (SELECT qid, vid,
             round(${dist2("qv", "cv")} * 1e6) / 1e6 AS dist FROM short)
       SELECT qid, vid, dist, rn FROM (
         SELECT qid, vid, dist,
           CAST(row_number() OVER (PARTITION BY qid
             ORDER BY dist ASC, vid ASC) AS BIGINT) AS rn
         FROM ex) WHERE rn <= $k"""
  }
}
