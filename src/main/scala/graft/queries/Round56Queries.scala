package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.text.GramIndex

/** Round-56 additions (build round 12, wave 12): the persisted
  * positional-GRAM index append loop — exact-substring spans join the
  * incremental-dedup index family (q194/q195 MinHash buckets, q382/q384
  * embedding cells, q419/q420 CDC chunks):
  *
  *  - q431 probe: a new batch is gram-scanned once and hash-joined
  *    against the persisted index; hits fold into maximal SPANS
  *    (q424's islands) — the spans a removal pass (q429) would excise
  *    from the incoming batch;
  *  - q432 merge: the accepted batch folds into the index with
  *    min/sum combination, pinned row-for-row against a from-scratch
  *    rebuild (gram boundaries depend only on content — no
  *    frozen-parameter caveat).
  *
  * Split fixture: index corpus = doc_id % 10 ≠ 0, batch = % 10 = 0
  * (the q419/q420 convention).
  */
object Round56Queries {

  private val L = 8

  private def splitDocs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = Tables.documents(s, d)
    (docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0))
  }

  private val gramCte: String =
    s"""tk AS (SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
         FROM documents),
       gr AS (SELECT doc_id, p, md5(array_to_string(toks[p:p+${L - 1}], ' ')) AS h
         FROM tk, unnest(range(1, len(toks) - ${L - 2})) t(p))"""

  private[queries] val probeOracle: Option[String] =
    Some(s"""WITH $gramCte,
             idx AS (SELECT DISTINCT h FROM gr WHERE doc_id % 10 != 0),
             dp AS (SELECT g.doc_id, g.p FROM gr g JOIN idx ON g.h = idx.h
               WHERE g.doc_id % 10 = 0),
             brk AS (SELECT doc_id, p,
                 CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                   OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > $L
                 THEN 1 ELSE 0 END AS f
               FROM dp),
             iid AS (SELECT doc_id, p,
                 sum(f) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
               FROM brk),
             sp AS (SELECT doc_id, island, min(p) AS s, max(p) + ${L - 1} AS e
               FROM iid GROUP BY 1, 2)
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
             FROM sp GROUP BY 1""")

  val defs: Seq[(String, QueryDef)] = Seq(

    "q431_gram_index_probe" -> QueryDef(
      (s, d) => {
        val (corpus, batch) = splitDocs(s, d)
        val path = graft.tools.Staging.dir("gram_index_probe", d)
        GramIndex.build(corpus, "doc_id", "text", L)
          .write.mode("overwrite").parquet(path)
        GramIndex.probe(s.read.parquet(path), batch, "doc_id", "text", L)
      },
      probeOracle),

    // merge ≡ rebuild: the oracle aggregates the FULL corpus from
    // scratch; the engine merges the persisted corpus index with the
    // batch delta — identical rows proves the append loop is exact.
    "q432_gram_index_merge" -> QueryDef(
      (s, d) => {
        val (corpus, batch) = splitDocs(s, d)
        val path = graft.tools.Staging.dir("gram_index_merge", d)
        GramIndex.build(corpus, "doc_id", "text", L)
          .write.mode("overwrite").parquet(path)
        GramIndex.merge(s.read.parquet(path), batch, "doc_id", "text", L)
      },
      Some(s"""WITH $gramCte
             SELECT h AS gram_md5, min(doc_id) AS owner,
               CAST(count(*) AS BIGINT) AS n_occ
             FROM gr GROUP BY 1""")),

    // Streaming twin of the probe — same contract, so the batch oracle
    // gates the stream (the islands window becomes a closed-form fold
    // over the doc's sorted hit positions; see DocStreams scaladoc).
    "q433_stream_gram_probe" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.gramIndexProbeStream(s, d, L),
      probeOracle)
  )
}
