package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num
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
             FROM documents GROUP BY 1""")))
}
