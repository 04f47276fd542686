package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.CategoricalDtype

/** Round-3 surface: categorical accessor depth — rename/add/remove
  * categories and ordered-category comparisons (reference
  * `frontend/accessors.py:32-39`, `core/column.py:831-911`). Oracle CASE
  * expressions are GENERATED from the same dtype objects the Spark plan
  * uses, so the dictionaries can't drift.
  */
object Round3Queries {

  private val prios =
    IndexedSeq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  private def sqlQuote(s: String) = "'" + s.replace("'", "''") + "'"

  /** CASE mapping value → its code in `dt` (−1 fallback ≡ codes()). */
  private def codeCase(dt: CategoricalDtype, col: String, noneCode: String = "-1"): String =
    dt.categories.zipWithIndex
      .map { case (c, i) => s"WHEN ${sqlQuote(c)} THEN $i" }
      .mkString(s"CASE $col ", " ", s" ELSE $noneCode END")

  val defs: Seq[(String, QueryDef)] = Seq(

    // cat.rename_categories + add_categories: relabel keeps codes, the
    // appended category extends the dictionary without recoding.
    "q135_cat_rename_add" -> QueryDef(
      (s, d) => {
        val dt0 = CategoricalDtype(prios)
        val ren = Map("1-URGENT" -> "URGENT", "2-HIGH" -> "HIGH",
          "3-MEDIUM" -> "MEDIUM", "4-NOT SPECIFIED" -> "UNSPECIFIED",
          "5-LOW" -> "LOW")
        val dt1 = dt0.renameCategories(ren).addCategories(Seq("UNKNOWN"))
        val v = dt0.renameColumn(col("o_orderpriority"), ren)
        Tables.orders(s, d).select(
          col("o_orderkey"), v.as("priority"),
          dt1.codes(v).as("code"),
          lit(dt1.categories.size).as("n_cats"))
      },
      Some {
        val dt0 = CategoricalDtype(prios)
        val ren = Map("1-URGENT" -> "URGENT", "2-HIGH" -> "HIGH",
          "3-MEDIUM" -> "MEDIUM", "4-NOT SPECIFIED" -> "UNSPECIFIED",
          "5-LOW" -> "LOW")
        val dt1 = dt0.renameCategories(ren).addCategories(Seq("UNKNOWN"))
        val renCase = prios.map(p => s"WHEN ${sqlQuote(p)} THEN ${sqlQuote(ren(p))}")
          .mkString("CASE o_orderpriority ", " ", " ELSE o_orderpriority END")
        s"""SELECT o_orderkey, $renCase AS priority,
           CAST(${codeCase(dt1, renCase)} AS INTEGER) AS code,
           CAST(${dt1.categories.size} AS INTEGER) AS n_cats
           FROM orders"""
      }),

    // ordered categorical with a LOGICAL order (≠ string collation) +
    // remove_categories: removed values go null, codes recompact, and
    // the >= comparison ranks by dictionary position.
    "q136_cat_ordered_remove" -> QueryDef(
      (s, d) => {
        val dt = CategoricalDtype(
          IndexedSeq("5-LOW", "4-NOT SPECIFIED", "3-MEDIUM", "2-HIGH", "1-URGENT"),
          ordered = true)
        val dt2 = dt.removeCategories(Seq("4-NOT SPECIFIED"))
        val v = dt.removeColumn(col("o_orderpriority"), Seq("4-NOT SPECIFIED"))
        Tables.orders(s, d).select(
          col("o_orderkey"), v.as("priority"),
          dt2.codes(v).as("code"),
          dt2.geq(v, "2-HIGH").as("is_high"))
      },
      Some {
        val dt2 = CategoricalDtype(
          IndexedSeq("5-LOW", "3-MEDIUM", "2-HIGH", "1-URGENT"), ordered = true)
        val nulled =
          "CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN NULL ELSE o_orderpriority END"
        s"""SELECT o_orderkey, $nulled AS priority,
           CAST(${codeCase(dt2, nulled)} AS INTEGER) AS code,
           ${codeCase(dt2, nulled, noneCode = "NULL")} >= ${dt2.codeOf("2-HIGH")} AS is_high
           FROM orders"""
      }),

    // STREAMING curation: quality gate + stateful exact dedup over the
    // replayed documents corpus — the incremental twin of q53, filtered
    // by the q51 quality score. Deterministic (min doc_id per
    // fingerprint), so the batch SQL checks the streaming state exactly.
    "q137_stream_curation" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.curate(s, d, minQuality = 0.5),
      Some(s"""SELECT ${TextQueries.fingerprintSql} AS fp,
             min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n
             FROM documents
             WHERE round(${TextQueries.qualitySql}, 6) >= 0.5
             GROUP BY 1"""))
  )
}
