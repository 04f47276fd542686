package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Num
import graft.plans.GroupTopK
import graft.text.TextStats

/** The flagship LLM-data-curation pipeline, end to end:
  * exact dedup (fingerprint keepers) → quality scoring → language ID →
  * top-5 documents per language by quality (custom GroupTopK operator).
  * Exactly the shape a 100 TB corpus-curation job runs: one scan
  * computes fingerprint+quality+lang, one small-key shuffle dedups, one
  * clustered shuffle takes the per-language winners.
  */
object CurationQueries {

  /** Oracle fragments mirroring TextStats formulas (same profile table
    * as q51/q52 — generated, so they cannot drift).
    */
  private val qualitySql =
    """least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4
      + (len(list_filter(string_split(text, ' '),
             t -> list_contains(['a','an','the','and','or','of','in','to','is'], t))) * 1.0
         / len(string_split(text, ' '))) * 0.3
      + least((length(replace(text, ' ', '')) * 1.0
               / len(string_split(text, ' '))) / 8.0, 1.0) * 0.3"""

  private def scoreSql(grams: Seq[String]): String = grams.map { g =>
    val q = g.replace("'", "''")
    s"(length(p) - length(replace(p, '$q', ''))) / ${g.length}"
  }.mkString(" + ")

  private val langSql: String = {
    val prof = TextStats.langProfiles.toMap
    s"""CASE WHEN regexp_matches(p, '[一-鿿]') THEN 'zh'
        WHEN (${scoreSql(prof("de"))}) > (${scoreSql(prof("en"))})
         AND (${scoreSql(prof("de"))}) > (${scoreSql(prof("fr"))})
         AND (${scoreSql(prof("de"))}) > (${scoreSql(prof("es"))}) THEN 'de'
        WHEN (${scoreSql(prof("fr"))}) > (${scoreSql(prof("en"))})
         AND (${scoreSql(prof("fr"))}) > (${scoreSql(prof("de"))})
         AND (${scoreSql(prof("fr"))}) > (${scoreSql(prof("es"))}) THEN 'fr'
        WHEN (${scoreSql(prof("es"))}) > (${scoreSql(prof("en"))})
         AND (${scoreSql(prof("es"))}) > (${scoreSql(prof("de"))})
         AND (${scoreSql(prof("es"))}) > (${scoreSql(prof("fr"))}) THEN 'es'
        ELSE 'en' END"""
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    "q102_curation_pipeline" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val scored = docs.select(
          col("doc_id"),
          TextStats.fingerprint(col("text")).as("fp"),
          Num.rnd(TextStats.qualityScore(col("text")), 6).as("quality"),
          TextStats.langId(col("text")).as("lang_guess"))
        // exact dedup: keep the min doc_id per fingerprint. A window min
        // over fp instead of groupBy+self-join: one shuffle, one scan of
        // the scored docs (the self-join form scans and scores twice).
        val keepers = scored
          .withColumn("__keep", min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("fp")))
          .filter(col("doc_id") === col("__keep")).drop("__keep")
        // per-language top-5 by quality via the custom bounded-heap op
        GroupTopK.topKPerKey(
            keepers.select("doc_id", "quality", "lang_guess"),
            Seq("lang_guess"), Seq(("quality", true), ("doc_id", false)), 5)
          .select("lang_guess", "doc_id", "quality")
      },
      Some(s"""WITH scored AS (
               SELECT doc_id,
                 md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
                 round(($qualitySql) * 1e6) / 1e6 AS quality,
                 $langSql AS lang_guess
               FROM (SELECT doc_id, text, ' ' || text || ' ' AS p FROM documents)),
             keepers AS (
               SELECT s.* FROM scored s
               JOIN (SELECT fp, min(doc_id) AS doc_id FROM scored GROUP BY fp) k
               ON s.fp = k.fp AND s.doc_id = k.doc_id)
             SELECT lang_guess, doc_id, quality FROM keepers
             QUALIFY row_number() OVER (PARTITION BY lang_guess
               ORDER BY quality DESC, doc_id ASC) <= 5"""),
      headline = true)
  )
}
