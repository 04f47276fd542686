package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.{NfcNormalize, Num}
import graft.text.TextStats

/** Round-50 additions (build round 12, wave 6):
  *
  *  - q417 Unicode NFC normalization (composed/decomposed fixtures
  *    injected — the step that makes byte-level dedup see visually
  *    identical text as identical);
  *  - q418 per-source dataset datasheet: the "data card" table
  *    (volume, token mass, mean quality, language spread, exact-dup
  *    mass) a curation run publishes per source.
  */
object Round50Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // NFC normalization: every third doc gets a DECOMPOSED suffix
    // (e + U+0301), every other doc the precomposed é — after NFC both
    // families are byte-identical ("café"), which the md5 pins. The
    // scan stage stays pure codegen (native NfcNormalize, with an
    // isNormalized fast path so ASCII pays one scan, zero copies).
    "q417_nfc_normalize" -> QueryDef(
      (s, d) => {
        val suffix = when(col("doc_id") % 3 === 0, lit(" caf" + "é"))
          .when(col("doc_id") % 3 === 1, lit(" café"))
          .otherwise(lit(""))
        Tables.documents(s, d)
          .select(col("doc_id"), concat(col("text"), suffix).as("t"))
          .select(col("doc_id"),
            length(col("t")).as("len_before"),
            length(NfcNormalize(col("t"))).as("len_after"),
            (NfcNormalize(col("t")) === col("t")).as("was_normalized"),
            md5(NfcNormalize(col("t"))).as("norm_md5"))
      },
      Some("""WITH inj AS (SELECT doc_id,
               text || CASE WHEN doc_id % 3 = 0 THEN ' caf' || 'e' || chr(769)
                            WHEN doc_id % 3 = 1 THEN ' caf' || chr(233)
                            ELSE '' END AS t
             FROM documents)
             SELECT doc_id,
               CAST(length(t) AS INTEGER) AS len_before,
               CAST(length(nfc_normalize(t)) AS INTEGER) AS len_after,
               nfc_normalize(t) = t AS was_normalized,
               md5(nfc_normalize(t)) AS norm_md5
             FROM inj""")),

    // Per-source datasheet: one corpus pass for volume/tokens/quality
    // (decimal-summed 6dp quality — the money-sum discipline), one
    // fingerprint agg for the exact-dup mass, a broadcast-sized join
    // of the two |sources|-row results.
    "q418_source_datasheet" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val stats = docs.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(TextStats.nTokens(col("text")).cast("long")).as("tokens"),
          countDistinct(col("lang")).as("n_langs"),
          Num.rnd(
            sum(Num.rnd(TextStats.qualityScore(col("text")), 6)
              .cast("decimal(18,6)")).cast("double") / count(lit(1)), 6)
            .as("mean_quality"))
        val dups = docs
          .groupBy(col("source"), graft.text.TextStats.fingerprint(col("text")).as("fp"))
          .agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(sum(when(col("c") >= 2, col("c") - 1).otherwise(0L)).as("dup_docs"))
        stats.join(dups, "source")
      },
      Some(s"""WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               round(CAST(sum(CAST(round(${TextQueries.qualitySql}, 6)
                   AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6) / 1e6
                 AS mean_quality
             FROM documents GROUP BY 1),
             fp AS (SELECT source, ${TextQueries.fingerprintSql} AS f,
                 count(*) AS c
               FROM documents GROUP BY 1, 2),
             du AS (SELECT source,
                 CAST(sum(CASE WHEN c >= 2 THEN c - 1 ELSE 0 END) AS BIGINT)
                   AS dup_docs
               FROM fp GROUP BY 1)
             SELECT st.*, du.dup_docs FROM st JOIN du USING (source)"""))
  )
}
