package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.{QueryDef, Tables}
import graft.text.{NgramList, PhraseHits, TokenCountWs}

/** Round-54 additions (build round 12, wave 10): span-level dedup +
  * training-order determinism —
  *
  *  - q424 duplicated-SPAN report (the Lee et al. 2022 exact-substring
  *    dedup shape: remove repeated SPANS, not whole documents): every
  *    token 8-gram occurring ≥2 times anywhere in the corpus marks its
  *    window duplicated; per document, overlapping duplicated windows
  *    merge into maximal spans (interval union via the lag-islands
  *    trick). q169 measures pair-level shared-gram FRACTIONS; this is
  *    the per-document span inventory a span-removal pass would edit.
  *  - q425 duplicated-span mass by source — where the repeated text
  *    lives (boilerplate-heavy sources light up here).
  *  - q426 multi-phrase blocklist matcher: native one-pass
  *    [[graft.text.PhraseHits]] lexicon scan (token-aligned, P phrases
  *    per document pass) vs P separate n-gram scans; per-source
  *    per-phrase occurrence/doc counts.
  *  - q427 deterministic EPOCH SHUFFLE order: reproducible training
  *    permutation per epoch from md5(doc_id:epoch), rank materialized
  *    scale-safely (∝-corpus-size hash-prefix buckets → bounded offset
  *    table → bucket-local row_number) — never a single-partition
  *    global window.
  *  - q428 balanced source INTERLEAVE order: round-robin across sources
  *    (bucketed rank-within-source via q427's machinery, then round)
  *    with the global position computed ARITHMETICALLY from the
  *    |sources|-bounded per-source totals — the deterministic
  *    curriculum-interleave twin of q285/q408.
  */
object Round54Queries {

  private val L = 8 // span gram width (tokens)

  /** Hex-prefix length for the two-phase rank bucketing (q427/q428):
    * bucket count grows ∝ corpus size (≈ n / 2^16 buckets, floor 256),
    * so every bucket-local row_number window holds ≤ ~64k rows at ANY
    * scale — the full-corpus (or per-source) sort never lands on one
    * partition, and the offset table stays ≤ n / 2^16 rows (a few MB
    * broadcast even at 10^10 docs).
    */
  private def hexPrefixLen(n: Long): Int = {
    var len = 2
    while (len < 8 && (n >> (4 * len)) > (1L << 16)) len += 1
    len
  }

  /** Oracle CTE chain ending in `rep(doc_id, n_spans, dup_tokens)` +
    * `tk(doc_id, toks)` — replays gram extraction, corpus-wide
    * duplicate marking, and the lag-islands interval union.
    */
  private val spanCte: String =
    s"""tk AS (SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
         FROM documents),
       gr AS (SELECT doc_id, p, md5(array_to_string(toks[p:p+${L - 1}], ' ')) AS h
         FROM tk, unnest(range(1, len(toks) - ${L - 2})) t(p)),
       dup AS (SELECT h FROM gr GROUP BY h HAVING count(*) >= 2),
       dp AS (SELECT doc_id, p FROM gr WHERE h IN (SELECT h FROM dup)),
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
         FROM iid GROUP BY 1, 2),
       rep AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
         FROM sp GROUP BY 1)"""

  /** Per-doc duplicated-span inventory: (doc_id, n_spans, dup_tokens).
    *
    * Shape at scale: one NgramList scan (Generate stays in codegen),
    * ONE hash-agg exchange keyed by the 128-bit gram hash (rows ∝
    * corpus tokens, map-side partial counts), one shuffle join back to
    * positions, one doc-keyed exchange for the islands window. No
    * driver funnel, no cartesian; the output is ∝ documents.
    */
  private def spans(s: SparkSession, d: String): DataFrame = {
    val g = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(ColumnBridge.column(NgramList(
          ColumnBridge.expression(col("text")), L))).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), md5(col("g")).as("h"))
    val dup = g.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("h")
    val w = Window.partitionBy("doc_id").orderBy("p")
    g.join(dup, "h")
      .select(col("doc_id"), col("p"))
      .withColumn("f",
        when(lag("p", 1).over(w).isNull || col("p") - lag("p", 1).over(w) > L, 1)
          .otherwise(0))
      .withColumn("island",
        sum("f").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("p").as("s"), (max(col("p")) + lit(L - 1)).as("e"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum((col("e") - col("s") + 1).cast("long")).as("dup_tokens"))
  }

  private val lexicon = Seq(
    "batch batch", "slow query", "join data", "window window",
    "key order sort")

  val defs: Seq[(String, QueryDef)] = Seq(

    "q424_dup_span_report" -> QueryDef(
      (s, d) => {
        val nt = Tables.documents(s, d).select(col("doc_id"),
          ColumnBridge.column(TokenCountWs(
            ColumnBridge.expression(col("text")))).cast("long").as("n_toks"))
        spans(s, d).join(nt, "doc_id")
      },
      Some(s"""WITH $spanCte
             SELECT r.doc_id, r.n_spans, r.dup_tokens,
               CAST(len(t.toks) AS BIGINT) AS n_toks
             FROM rep r JOIN tk t USING (doc_id)""")),

    "q425_dup_span_by_source" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tot = docs.groupBy("source")
          .agg(count(lit(1)).as("total_docs"),
            sum(ColumnBridge.column(TokenCountWs(
              ColumnBridge.expression(col("text")))).cast("long"))
              .as("total_tokens"))
        val da = spans(s, d)
          .join(docs.select("doc_id", "source"), "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("docs_with_dups"),
            sum("dup_tokens").as("dup_tokens"),
            sum("n_spans").as("n_spans"))
        tot.join(da, Seq("source"), "left")
          .select(col("source"), col("total_docs"), col("total_tokens"),
            coalesce(col("docs_with_dups"), lit(0L)).as("docs_with_dups"),
            coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"))
      },
      Some(s"""WITH $spanCte,
             tot AS (SELECT d.source, CAST(count(*) AS BIGINT) AS total_docs,
                 CAST(sum(len(t.toks)) AS BIGINT) AS total_tokens
               FROM documents d JOIN tk t USING (doc_id) GROUP BY 1),
             da AS (SELECT d.source,
                 CAST(count(*) AS BIGINT) AS docs_with_dups,
                 CAST(sum(r.dup_tokens) AS BIGINT) AS dup_tokens,
                 CAST(sum(r.n_spans) AS BIGINT) AS n_spans
               FROM rep r JOIN documents d USING (doc_id) GROUP BY 1)
             SELECT t.source, t.total_docs, t.total_tokens,
               CAST(coalesce(da.docs_with_dups, 0) AS BIGINT) AS docs_with_dups,
               CAST(coalesce(da.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               CAST(coalesce(da.n_spans, 0) AS BIGINT) AS n_spans
             FROM tot t LEFT JOIN da ON t.source = da.source""")),

    // Blocklist lexicon scan: ONE PhraseHits pass per document for the
    // whole lexicon; only non-zero (doc, phrase) pairs leave the scan
    // stage, then a single hash-agg by (source, phrase).
    "q426_blocklist_phrases" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("source"),
          posexplode(ColumnBridge.column(PhraseHits(
            ColumnBridge.expression(col("text")), lexicon))).as(Seq("pi", "cnt")))
        .filter(col("cnt") > 0)
        .select(col("source"),
          element_at(array(lexicon.map(lit): _*), col("pi") + 1).as("phrase"),
          col("cnt"))
        .groupBy("source", "phrase")
        .agg(sum(col("cnt")).as("n_occ"), count(lit(1)).as("n_docs")),
      Some(s"""WITH tk AS (SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS toks
               FROM documents),
             g2 AS (SELECT doc_id, array_to_string(toks[p:p+1], ' ') AS g
               FROM tk, unnest(range(1, len(toks))) t(p)),
             g3 AS (SELECT doc_id, array_to_string(toks[p:p+2], ' ') AS g
               FROM tk, unnest(range(1, len(toks) - 1)) t(p)),
             occ AS (SELECT doc_id, g AS phrase, count(*) AS c
               FROM (SELECT * FROM g2 UNION ALL SELECT * FROM g3)
               WHERE g IN (${lexicon.map(p => s"'$p'").mkString(", ")})
               GROUP BY 1, 2)
             SELECT d.source, o.phrase, CAST(sum(o.c) AS BIGINT) AS n_occ,
               CAST(count(*) AS BIGINT) AS n_docs
             FROM occ o JOIN documents d USING (doc_id) GROUP BY 1, 2""")),

    // Reproducible per-epoch training permutation. Rank materialization
    // is two-phase: n/2^16 key-prefix buckets (hexPrefixLen — ∝ corpus
    // size, floor 256) → bounded (epochs×buckets) offset table via a
    // tiny window → broadcast join + bucket-local row_number. The
    // full-corpus sort never lands on one partition at any scale.
    "q427_epoch_shuffle" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val plen = hexPrefixLen(docs.count())
        val keyed = docs
          .select(col("doc_id"),
            explode(array(lit(0L), lit(1L), lit(2L))).as("epoch"))
          .withColumn("k", md5(concat(col("doc_id").cast("string"), lit(":"),
            col("epoch").cast("string"))))
          .withColumn("b", substring(col("k"), 1, plen))
        val offs = keyed.groupBy("epoch", "b").agg(count(lit(1)).as("c"))
          .withColumn("off", coalesce(
            sum("c").over(Window.partitionBy("epoch").orderBy("b")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("epoch", "b", "off")
        keyed.join(broadcast(offs), Seq("epoch", "b"))
          .select(col("epoch"), col("doc_id"),
            (col("off") + row_number()
              .over(Window.partitionBy("epoch", "b").orderBy("k"))
              .cast("long")).as("rk"))
      },
      Some("""SELECT CAST(e.epoch AS BIGINT) AS epoch, d.doc_id,
               CAST(row_number() OVER (PARTITION BY e.epoch
                 ORDER BY md5(d.doc_id || ':' || e.epoch)) AS BIGINT) AS rk
             FROM documents d CROSS JOIN (VALUES (0), (1), (2)) e(epoch)""")),

    // Balanced source interleave: within-source rank via the SAME
    // two-phase bucketed machinery as q427 — (source, hash-prefix
    // bucket) counts → per-source offset table (|sources|×buckets rows,
    // broadcast) → bucket-local row_number — so per-source rank
    // parallelism is ∝ buckets, never |sources| (VERDICT r12: the old
    // per-source global window was one task per source at any scale).
    // The GLOBAL position then comes from per-source totals only —
    // pos = Σ_s min(rn-1, n_s) + |{s' < src : n_s' ≥ rn}| + 1
    // (totals |sources|-bounded, folded into a scan-stage expression);
    // no global window anywhere.
    "q428_source_interleave" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val totals: Seq[(String, Long)] = docs.groupBy("source")
          .agg(count(lit(1)).as("c")).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
        val plen = hexPrefixLen(totals.map(_._2).max)
        val keyed = docs.select(col("doc_id"), col("source"))
          .withColumn("h", md5(col("doc_id").cast("string")))
          .withColumn("b", substring(col("h"), 1, plen))
        val offs = keyed.groupBy("source", "b").agg(count(lit(1)).as("c"))
          .withColumn("off", coalesce(
            sum("c").over(Window.partitionBy("source").orderBy("b")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("source", "b", "off")
        val r = keyed.join(broadcast(offs), Seq("source", "b"))
          .withColumn("rn", col("off") + row_number()
            .over(Window.partitionBy("source", "b").orderBy("h")).cast("long"))
        val fullRounds = totals.map { case (_, n2) =>
          least(col("rn") - 1, lit(n2)) }.reduce(_ + _)
        val withinRound = totals.map { case (s2, n2) =>
          when(lit(s2) < col("source") && lit(n2) >= col("rn"), lit(1L))
            .otherwise(lit(0L)) }.reduce(_ + _)
        r.select(col("doc_id"), col("source"), col("rn"),
          (fullRounds + withinRound + lit(1L)).as("pos"))
      },
      Some("""WITH r AS (SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR))) AS BIGINT) AS rn
             FROM documents)
             SELECT doc_id, source, rn,
               CAST(row_number() OVER (ORDER BY rn, source) AS BIGINT) AS pos
             FROM r"""))
  )
}
