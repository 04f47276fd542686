package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num

/** Round-61 additions (build round 13, wave 4):
  *
  *  - q446 STREAMING Naive-Bayes classification: the ingest-time
  *    deployment of q437's trained model — frozen to exact 6dp-grid
  *    longs and scored in the scan stage (stateless, no join, no
  *    state; decimal-grid ≡ scaled-long arithmetic keeps the argmax
  *    bit-identical to the batch DataFrame path, so q437's oracle
  *    gates the stream).
  *  - q447 PSI drift per source between two table snapshots
  *    (Population Stability Index over fixed token-count buckets,
  *    Laplace-smoothed) — the data-quality monitor a recurring crawl
  *    runs against its previous drop; composes with q445's versioned
  *    table. Transcendental terms follow the q153 discipline.
  */
object Round61Queries {

  private val NBUCKET = 8 // fixed-width token-count buckets (10 wide, last open)

  val defs: Seq[(String, QueryDef)] = Seq(

    "q446_stream_nb_classify" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.nbClassifyStream(s, d),
      Round58Queries.defs.collectFirst {
        case ("q437_naive_bayes_lang", q) => q.oracle.get
      }),

    // Both snapshot sides reduce to (source, bucket) counts — bounded
    // rows after one agg each — then the PSI fold is arithmetic over
    // the tiny join. Smoothed shares p,q = (c+1)/(n+B); each term
    // (p−q)·ln(p/q) is 6dp-rounded then DECIMAL-summed.
    "q447_psi_drift" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val base = docs.select(col("doc_id"), col("text"), col("source"))
        val next = graft.operators.CdcUpsert.applyChanges(
          base, graft.operators.CdcUpsert.changesOf(docs))
        // shape notes in [[graft.operators.Psi]] (one corpus pass per
        // side; empty-on-both buckets folded in arithmetically)
        graft.operators.Psi.fold(
          graft.operators.Psi.hist(base, NBUCKET, "cb"),
          graft.operators.Psi.hist(next, NBUCKET, "cn"), NBUCKET)
      },
      Some(s"""WITH changes AS (SELECT
               CASE WHEN doc_id % 30 = 20 THEN doc_id + 10000000 ELSE doc_id END
                 AS doc_id,
               CASE WHEN doc_id % 30 = 0 THEN 'D'
                    WHEN doc_id % 30 = 10 THEN 'U' ELSE 'I' END AS op,
               text || ' ' || text AS new_text,
               source AS new_source
             FROM documents WHERE doc_id % 10 = 0),
             newt AS (SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
                 CASE WHEN c.op IS NOT NULL THEN c.new_text ELSE b.text END AS text,
                 COALESCE(c.new_source, b.source) AS source
               FROM documents b FULL OUTER JOIN changes c ON b.doc_id = c.doc_id
               WHERE COALESCE(c.op, '') != 'D'),
             hb AS (SELECT source,
                 least(len(list_filter(string_split(text, ' '), x -> x <> ''))
                   // 10, ${NBUCKET - 1}) AS bucket, count(*) AS c
               FROM documents GROUP BY 1, 2),
             hn AS (SELECT source,
                 least(len(list_filter(string_split(text, ' '), x -> x <> ''))
                   // 10, ${NBUCKET - 1}) AS bucket, count(*) AS c
               FROM newt GROUP BY 1, 2),
             srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS nb FROM hb GROUP BY 1),
             nns AS (SELECT source, CAST(sum(c) AS BIGINT) AS nn FROM hn GROUP BY 1),
             spine AS (SELECT s.source, s.nb, n.nn, b.bucket
               FROM srcs s JOIN nns n ON s.source = n.source,
                 unnest(range(0, $NBUCKET)) b(bucket)),
             j AS (SELECT sp.source, sp.nb, sp.nn,
                 COALESCE(hb.c, 0) AS cb, COALESCE(hn.c, 0) AS cn
               FROM spine sp
               LEFT JOIN hb ON hb.source = sp.source AND hb.bucket = sp.bucket
               LEFT JOIN hn ON hn.source = sp.source AND hn.bucket = sp.bucket)
             SELECT source, CAST(sum(CAST(round(
                 ((cb + 1.0) / (nb + $NBUCKET) - (cn + 1.0) / (nn + $NBUCKET)) *
                 ln(((cb + 1.0) / (nb + $NBUCKET)) / ((cn + 1.0) / (nn + $NBUCKET))), 6)
               AS DECIMAL(18,6))) AS DOUBLE) AS psi
             FROM j GROUP BY 1"""))
  )
}
