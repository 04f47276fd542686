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

  /** Mixture-sampling rates (training-data recipe: upsample curated
    * sources, downsample the rest). Strictly < 1.0 — the 16-hex-digit
    * threshold encoding needs it.
    */
  private val mixtureRates: Seq[(String, Double)] =
    Seq("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.25)
  private val mixtureDefaultRate = 0.1

  /** floor(rate · 2^64) as 16 lowercase hex digits — the keep-threshold
    * for the md5-uniform draw.
    */
  private def rateHex(r: Double): String = {
    require(r > 0 && r < 1, "rate in (0,1)")
    val t = (BigDecimal(BigInt(1) << 64) * r).toBigInt
    String.format("%016x", t.bigInteger)
  }

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

    // GFrame.describe — pandas describe() numeric summary. Columns are
    // integer-valued (exact double sums), so mean/std are
    // order-independent across engines after rounding.
    "q141_describe" -> QueryDef(
      (s, d) => graft.api.GFrame(Tables.lineitem(s, d))
        .describe("l_quantity", "l_linenumber").df
        .select(col("summary"),
          graft.functions.Num.rnd(col("l_quantity"), 6).as("l_quantity"),
          graft.functions.Num.rnd(col("l_linenumber"), 6).as("l_linenumber")),
      Some(Seq(
        ("'count'", "CAST(count(%s) AS DOUBLE)"),
        ("'mean'", "avg(%s)"),
        ("'std'", "stddev_samp(%s)"),
        ("'min'", "CAST(min(%s) AS DOUBLE)"),
        ("'max'", "CAST(max(%s) AS DOUBLE)")).map { case (name, fn) =>
        s"""SELECT $name AS summary,
           round(${fn.format("l_quantity")}, 6) AS l_quantity,
           round(${fn.format("l_linenumber")}, 6) AS l_linenumber
           FROM lineitem"""
      }.mkString(" UNION ALL "))),

    // GFrame.nunique — distinct cardinality per column, one row.
    "q142_nunique" -> QueryDef(
      (s, d) => graft.api.GFrame(Tables.lineitem(s, d))
        .nunique("l_orderkey", "l_suppkey", "l_returnflag").df,
      Some("""SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS l_orderkey,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS l_suppkey,
             CAST(count(DISTINCT l_returnflag) AS BIGINT) AS l_returnflag
             FROM lineitem""")),

    // training-data MIXTURE sampling: stratified per-source rates via a
    // deterministic md5-uniform (u = first 16 md5 hex chars of the id;
    // keep iff u < rate·2^64 as hex — lowercase hex compares
    // lexicographically = numerically). The same draw on both engines,
    // so the oracle checks the exact sampled set; at corpus scale this
    // is a pure scan-stage filter, no shuffle, reproducible across runs
    // and cluster sizes (the property dataset mixing actually needs).
    "q139_mixture_sample" -> QueryDef(
      (s, d) => {
        val u = md5(col("doc_id").cast("string"))
        val thr = mixtureRates.foldLeft(when(lit(false), ""): org.apache.spark.sql.Column) {
          case (acc, (src, r)) => acc.when(col("source") === src, lit(rateHex(r)))
        }.otherwise(lit(rateHex(mixtureDefaultRate)))
        Tables.documents(s, d)
          .filter(substring(u, 1, 16) < thr)
          .select(col("doc_id"), col("source"), col("lang"))
      },
      Some {
        val cases = mixtureRates.map { case (src, r) =>
          s"WHEN ${sqlQuote(src)} THEN ${sqlQuote(rateHex(r))}"
        }.mkString(" ")
        s"""SELECT doc_id, source, lang FROM documents
           WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) <
                 (CASE source $cases ELSE ${sqlQuote(rateHex(mixtureDefaultRate))} END)"""
      }),

    // context-window CHUNKING: split each document's token stream into
    // fixed windows (128 tokens, stride 96 → 32-token overlap) — the
    // sequence-construction step before packing/tokenization. Pure
    // scan-stage explode (no shuffle); chunk content is pinned by md5.
    "q140_token_chunks" -> QueryDef(
      (s, d) => {
        val t = split(col("text"), " ")
        Tables.documents(s, d)
          .select(col("doc_id"), t.as("t"), size(t).as("n"))
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), ((col("n") - 1) / 96).cast("int")),
              i => struct(i.as("i"), slice(col("t"), i * 96 + 1, lit(128)).as("c"))))
              .as("ch"))
          .select(col("doc_id"),
            col("ch.i").cast("int").as("chunk_id"),
            size(col("ch.c")).as("n_tok"),
            md5(concat_ws(" ", col("ch.c"))).as("chunk_md5"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t,
                    len(string_split(text, ' ')) AS n FROM documents),
             ch AS (SELECT doc_id, t,
                      unnest(range((n - 1) // 96 + 1)) AS i
                    FROM t)
             SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
               CAST(len(t[(96*i + 1):(96*i + 128)]) AS INTEGER) AS n_tok,
               md5(array_to_string(t[(96*i + 1):(96*i + 128)], ' ')) AS chunk_md5
             FROM ch""")),

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
