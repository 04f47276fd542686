package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.text.Bm25

/** Round-13 additions: the multi-query BM25 batch surface.
  *
  * (reference scope note: the reference has no retrieval surface —
  * this is beyond-parity pipeline tooling, same family as q240.)
  */
object Round13Queries {

  // ---- BM25 batch ----

  private val bmK1 = 1.2
  private val bmB = 0.75

  /** The probe-query table: a curation pipeline scoring several slices
    * of the corpus in one pass. Overlapping vocabularies exercise the
    * shared-slot path; q3's disjoint singleton exercises a df that the
    * other queries never touch.
    */
  private val batchQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "join", "window", "hash"), // = q240's query
    2L -> Seq("window", "spark"),
    3L -> Seq("the", "data", "join"))

  /** q240's oracle SQL generalized: per-query replay (each query's df
    * stats depend only on its own terms — corpus properties) with a
    * qid constant, UNION ALL over the query table.
    */
  private def bm25BatchOracleSql(queries: Seq[(Long, Seq[String])], k: Int): String = {
    val dl = "CAST(len(string_split(text, ' ')) AS DOUBLE)"
    def tfSql(t: String) =
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$t')) AS DOUBLE)"
    def one(qid: Long, terms: Seq[String]): String = {
      val dfCols = terms.zipWithIndex.map { case (t, i) =>
        s"sum(CASE WHEN ${tfSql(t)} > 0 THEN 1.0 ELSE 0.0 END) AS df_$i"
      }.mkString(", ")
      val scoreSql = terms.zipWithIndex.map { case (t, i) =>
        val idf = s"ln(1.0 + (n_docs - df_$i + 0.5) / (df_$i + 0.5))"
        s"($idf * (${tfSql(t)} * ${bmK1 + 1.0}) / (${tfSql(t)} + $bmK1 * (${1.0 - bmB} + $bmB * $dl / avgdl)))"
      }.mkString(" + ")
      s"""SELECT qid, doc_id, bm25, rn FROM (
            WITH stats AS (
              SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                     avg($dl) AS avgdl, $dfCols
              FROM documents),
            scored AS (
              SELECT doc_id, round(($scoreSql) * 1e6) / 1e6 AS bm25
              FROM documents, stats)
            SELECT CAST($qid AS BIGINT) AS qid, doc_id, bm25,
              CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rn
            FROM scored WHERE bm25 > 0
            QUALIFY rn <= $k)"""
    }
    queries.map { case (q, t) => one(q, t) }.mkString(" UNION ALL ")
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // Multi-query BM25 in ONE corpus pass: union-vocabulary
    // TermCounts scan → broadcast stats → per-query scores exploded to
    // (qid, doc, score) → GroupTopK per qid (≤ |Q|·k rows shuffle).
    // The oracle replays each query independently — proving the shared
    // scan changes nothing.
    "q249_bm25_batch" -> QueryDef(
      // cache=false: the gate plan is fully lazy (two TermCounts corpus
      // passes instead of cache+bounded-collect), so every execution
      // re-pays the real scans — honest re-execution accounting and no
      // cache churn in the bench.
      (s, d) => Bm25.topKBatch(
        Tables.fanout(Tables.documents(s, d), d, "documents"), "doc_id", "text",
        batchQueries, k = 20, k1 = bmK1, b = bmB, cache = false),
      Some(bm25BatchOracleSql(batchQueries, 20)),
      headline = true))
}
