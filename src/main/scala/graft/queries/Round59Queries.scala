package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num

/** Round-59 additions (build round 13, wave 2):
  *
  *  - q440 PERSISTED Naive-Bayes model loop: the classifier joins the
  *    fit-once/probe-many family (gram index q431, MG sketch q389, LSH
  *    buckets q194) — the model is one long-format parquet table, and
  *    classifying a new batch pays only the scoring join, never a
  *    refit. Gated by the same confusion oracle as q437 (prefit ≡
  *    refit, pinned).
  *  - q441 Matryoshka-style truncated-embedding retrieval eval: brute
  *    cosine top-5 on the FIRST 16 of 64 dims vs the full-dim truth —
  *    per-query overlap and recall, the measurement that decides
  *    whether a cheaper prefix index can serve first-stage retrieval
  *    (the operating-point discipline of q378 applied to dimension
  *    truncation).
  *  - q442 CDC upsert (MERGE INTO semantics): a change batch with
  *    I/U/D ops applied to the base table in ONE full-outer hash join —
  *    the lakehouse table-maintenance shape; deterministic op
  *    derivation so the oracle replays it exactly.
  */
object Round59Queries {

  /** q442's oracle, shared with its streaming twin q443. */
  private val cdcOracle: Option[String] =
    Some("""WITH changes AS (SELECT
               CASE WHEN doc_id % 30 = 20 THEN doc_id + 10000000 ELSE doc_id END
                 AS doc_id,
               CASE WHEN doc_id % 30 = 0 THEN 'D'
                    WHEN doc_id % 30 = 10 THEN 'U' ELSE 'I' END AS op,
               text || ' ' || text AS new_text,
               source AS new_source
             FROM documents WHERE doc_id % 10 = 0)
             SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
               md5(CASE WHEN c.op IS NOT NULL THEN c.new_text ELSE b.text END)
                 AS text_md5,
               COALESCE(c.new_source, b.source) AS source
             FROM documents b FULL OUTER JOIN changes c ON b.doc_id = c.doc_id
             WHERE COALESCE(c.op, '') != 'D'""")

  val defs: Seq[(String, QueryDef)] = Seq(

    "q440_nb_model_prefit" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val train = docs.filter(col("doc_id") % 10 =!= 0)
        val test = docs.filter(col("doc_id") % 10 === 0)
        // modTime-keyed (r14): same stale-artifact guard as q232's sketch.
        val path = graft.tools.Staging.dirKeyedOnSource(s, "nb_model_q440", d, "documents")
        val hp = new org.apache.hadoop.fs.Path(path)
        val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (!fs.exists(hp))
          graft.text.NaiveBayes.fitModel(train, "text", "lang")
            .write.mode("overwrite").parquet(path)
        graft.text.NaiveBayes.confusionFromModel(
            s.read.parquet(path), test, "text", "lang", "doc_id")
          .select(col("true_label").as("true_lang"),
            col("pred_label").as("pred_lang"), col("n_docs"))
      },
      // prefit ≡ refit: identical oracle to q437
      Round58Queries.defs.collectFirst {
        case ("q437_naive_bayes_lang", q) => q.oracle.get
      }),

    // Truncation keeps the cosine discipline: norms recomputed over the
    // 16-dim slice on BOTH engines (same double fold), rnd6 before
    // ranking. One broadcast of the 8 queries per ranking; GroupTopK
    // partial heaps bound the exchange.
    "q441_matryoshka_recall" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 8)
        def trunc(df: org.apache.spark.sql.DataFrame) =
          df.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
        val full = graft.similarity.Similarity.bruteForceTopK(q, e, 5)
          .select(col("qid"), col("vid"))
        val tr = graft.similarity.Similarity.bruteForceTopK(trunc(q), trunc(e), 5)
          .select(col("qid"), col("vid"), lit(true).as("hit"))
        full.join(tr, Seq("qid", "vid"), "left")
          .groupBy("qid")
          .agg(count(lit(1)).as("n_truth"),
            sum(when(col("hit"), 1L).otherwise(0L)).as("n_overlap"))
          .withColumn("recall",
            Num.rnd(col("n_overlap").cast("double") / col("n_truth"), 6))
      },
      Some(s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
             fs AS (SELECT q.vec_id AS qid, c.vec_id AS vid,
                 round(${SimilarityQueries.sqlCosPub("q.embedding", "c.embedding")}
                   * 1e6) / 1e6 AS sim
               FROM q, embeddings c WHERE c.vec_id != q.vec_id),
             fr AS (SELECT qid, vid FROM (SELECT qid, vid,
                 row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn
               FROM fs) WHERE rn <= 5),
             ts AS (SELECT q.vec_id AS qid, c.vec_id AS vid,
                 round(${SimilarityQueries.sqlCosPub("q.embedding[1:16]", "c.embedding[1:16]")}
                   * 1e6) / 1e6 AS sim
               FROM q, embeddings c WHERE c.vec_id != q.vec_id),
             tr AS (SELECT qid, vid FROM (SELECT qid, vid,
                 row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn
               FROM ts) WHERE rn <= 5)
             SELECT fr.qid, CAST(count(*) AS BIGINT) AS n_truth,
               CAST(sum(CASE WHEN tr.vid IS NULL THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_overlap,
               round(CAST(sum(CASE WHEN tr.vid IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
                 / count(*), 6) AS recall
             FROM fr LEFT JOIN tr ON fr.qid = tr.qid AND fr.vid = tr.vid
             GROUP BY 1""")),

    // ops: doc_id%30=0 → D(elete), %30=10 → U(pdate: text doubled),
    // %30=20 → I(nsert under doc_id+10^7). ONE full-outer join applies
    // the batch ([[graft.operators.CdcUpsert]]); output keyed by
    // md5(text) so the gate stays compact.
    "q442_cdc_upsert" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.CdcUpsert.applyChanges(
            docs.select(col("doc_id"), col("text"), col("source")),
            graft.operators.CdcUpsert.changesOf(docs))
          .select(col("doc_id"), md5(col("text")).as("text_md5"), col("source"))
      },
      cdcOracle),

    // Streaming twin: multi-microbatch copy-on-write merge loop over a
    // versioned parquet table (see DocStreams.cdcUpsertStream); the
    // batch oracle gates it because key-disjoint batches compose.
    "q443_stream_cdc_upsert" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.cdcUpsertStream(s, d),
      cdcOracle)
  )
}
