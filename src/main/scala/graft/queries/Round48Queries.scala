package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.text.Bm25
import graft.similarity.Similarity

/** Round-48 additions (build round 12, wave 4): retrieval-training and
  * text-hygiene operators —
  *
  *  - q410 hard-negative mining: tier the union of the lexical (BM25)
  *    and semantic (cosine) top-k lists — in-both = positive,
  *    lexical-only = hard negative, semantic-only = semantic candidate.
  *    This is the triple-mining step of training a dense retriever
  *    (the classic "BM25 negatives" recipe);
  *  - q411 PII redaction: regex scrub of emails / IPv4 literals with
  *    per-type counts (patterns injected deterministically so the gate
  *    exercises real replacements on the synthetic corpus);
  *  - q412 per-source boilerplate strip: discover each source's common
  *    text prefix via the min/max trick (the common prefix of ALL
  *    strings in a group equals the common prefix of its lexicographic
  *    min and max — one agg, O(1) state per group) and strip it.
  */
object Round48Queries {

  /** Longest common prefix length of two strings. */
  private def lcp(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // Hard-negative mining over the q399 retrieval pair: both bounded
    // top-k lists (≤ depth rows each) full-outer joined and tiered.
    // Everything expensive is the two retrievals already gated at
    // q240/q58; the mining itself is a k×k local join.
    "q410_hard_negatives" -> QueryDef(
      (s, d) => {
        val bm = Bm25.topK(Tables.documents(s, d), "doc_id", "text",
          Round46Queries.rrfTerms, Round46Queries.rrfDepth,
          k1 = Round46Queries.rrfK1, b = Round46Queries.rrfB)
          .select(col("doc_id").as("id"), col("rn").as("rb"))
        val e = Tables.embeddings(s, d)
        val ann = Similarity.bruteForceTopK(
          e.filter(col("vec_id") === Round46Queries.rrfQvec), e,
          Round46Queries.rrfDepth)
          .select(col("vid").as("id"), col("rn").as("ra"))
        bm.join(ann, Seq("id"), "full_outer")
          .select(col("id"),
            when(col("rb").isNotNull && col("ra").isNotNull, "positive")
              .when(col("rb").isNotNull, "hard_negative")
              .otherwise("semantic_only").as("tier"),
            coalesce(col("rb"), lit(-1L)).as("lex_rank"),
            coalesce(col("ra"), lit(-1L)).as("sem_rank"))
      },
      Some(s"""WITH ${Round46Queries.bm25RankCte},
             ${Round46Queries.annRankCte}
             SELECT COALESCE(b.doc_id, a.vid) AS id,
               CASE WHEN b.rn IS NOT NULL AND a.rn IS NOT NULL THEN 'positive'
                    WHEN b.rn IS NOT NULL THEN 'hard_negative'
                    ELSE 'semantic_only' END AS tier,
               COALESCE(b.rn, -1) AS lex_rank,
               COALESCE(a.rn, -1) AS sem_rank
             FROM bm b FULL OUTER JOIN ann a ON b.doc_id = a.vid""")),

    // PII redaction: scrub emails and IPv4 literals in one scan stage,
    // reporting per-type counts. The corpus is synthetic words, so the
    // gate deterministically injects one email + one IP into every
    // third document first — the redactor then has real work on every
    // injected row and must leave the rest byte-identical.
    "q411_pii_redact" -> QueryDef(
      (s, d) => {
        val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val injected = Tables.documents(s, d).select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id"),
              lit("@example.com from 10.0."), col("doc_id") % 256, lit(".7")))
            .otherwise(col("text")).as("t"))
        injected.select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("t"), lit(ipRe), lit(0))).as("n_ips"),
          md5(regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
            ipRe, "<IP>")).as("redacted_md5"))
      },
      Some("""WITH inj AS (SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.7'
                 ELSE text END AS t
             FROM documents)
             SELECT doc_id,
               CAST(len(regexp_extract_all(t,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(t,
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
               md5(regexp_replace(regexp_replace(t,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'))
                 AS redacted_md5
             FROM inj""")),

    // Boilerplate strip: each source's docs get a deterministic header
    // injected ("[srcN] "), the operator rediscovers it as the common
    // prefix of the source's lexicographic min/max texts (ONE hash agg
    // with two string cells of state per source — never a per-source
    // scan of all docs) and strips it. The tiny (source, prefix) table
    // is computed on ≤|sources| driver rows and broadcast back.
    "q412_boilerplate_strip" -> QueryDef(
      (s, d) => {
        val t = Tables.documents(s, d).select(col("doc_id"), col("source"),
          concat(lit("["), col("source"), lit("] "), col("text")).as("t2"))
        val mm = t.groupBy("source").agg(min(col("t2")).as("mn"), max(col("t2")).as("mx"))
          .collect() // bounded: one row per source
        val cpl = mm.map(r => (r.getString(0),
          lcp(r.getString(1), r.getString(2)).toLong))
        val cplDf = s.createDataFrame(
          java.util.Arrays.asList(cpl.map(p =>
            org.apache.spark.sql.Row(p._1, p._2)): _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("source",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("cpl",
              org.apache.spark.sql.types.LongType, nullable = false))))
        t.join(broadcast(cplDf), "source")
          .groupBy("source")
          .agg(max(col("cpl")).as("prefix_len"),
            count(lit(1)).as("n_docs"),
            sum(length(col("t2")) - col("cpl")).as("chars_after"))
          .select(col("source"), col("prefix_len"), col("n_docs"),
            col("chars_after").cast("long").as("chars_after"))
      },
      Some("""WITH t AS (SELECT doc_id, source,
               '[' || source || '] ' || text AS t2 FROM documents),
             mm AS (SELECT source, min(t2) AS mn, max(t2) AS mx FROM t GROUP BY 1),
             cp AS (SELECT source,
               coalesce((SELECT max(u) FROM
                   unnest(range(1, CAST(least(len(mn), len(mx)) + 1 AS BIGINT))) AS r(u)
                 WHERE substr(mn, 1, CAST(u AS INTEGER))
                     = substr(mx, 1, CAST(u AS INTEGER))), 0) AS cpl
               FROM mm)
             SELECT t.source, CAST(cp.cpl AS BIGINT) AS prefix_len,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(t2) - cp.cpl) AS BIGINT) AS chars_after
             FROM t JOIN cp ON t.source = cp.source
             GROUP BY 1, 2"""))
  )
}
