package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Round-23 additions: incremental materialized-aggregate maintenance.
  */
object Round23Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Incremental materialized-view maintenance: the per-source
    // (n_docs, total_len) aggregate maintained under q279's
    // DELETE/UPDATE/INSERT changelog by DELTA AGGREGATION — base agg
    // plus signed contributions, never a rescan of the snapshot.
    // Spark computes base ⊎ delta; the ORACLE recomputes the aggregate
    // directly over the applied snapshot, so the gate PROVES
    // base + delta ≡ recompute (the correctness contract of
    // incremental view maintenance).  All contributions are exact
    // longs; at 100 TB this is the only affordable way to keep
    // corpus-level stats current between crawls.
    "q301_incremental_agg" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val base = docs.groupBy("source")
          .agg(count(lit(1)).as("dn"), sum(length(col("text"))).as("dl"))
        // the q279 changelog, as signed delta contributions
        val deletes = docs.filter(col("doc_id") % 7 === 0)
          .select(col("source"), lit(-1L).as("dn"),
            (-length(col("text"))).cast("long").as("dl"))
        val updates = docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 7 =!= 0)
          .select(col("source"), lit(0L).as("dn"),
            (length(concat(col("text"), lit(" v2")))
              - length(col("text"))).cast("long").as("dl"))
        val inserts = docs.filter(col("doc_id") % 11 === 0)
          .select(col("source"), lit(1L).as("dn"),
            length(col("text")).cast("long").as("dl"))
        base.select(col("source"), col("dn"), col("dl"))
          .unionByName(deletes).unionByName(updates).unionByName(inserts)
          .groupBy("source")
          .agg(sum(col("dn")).as("n_docs"), sum(col("dl")).as("total_len"))
      },
      Some("""WITH applied AS (
            SELECT doc_id, source,
              CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
            FROM documents WHERE doc_id % 7 != 0
            UNION ALL
            SELECT doc_id + 1000000, source, text FROM documents
            WHERE doc_id % 11 = 0)
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(length(text)) AS BIGINT) AS total_len
          FROM applied GROUP BY 1""")),

    // §2.12 WEIGHTED PageRank: mass splits proportionally to trade
    // volume (lineitem multiplicity as integer edge weight) —
    // contribution = (pr·w) div sw, same fixed-point replay
    // discipline as q263.
    "q302_weighted_pagerank" -> QueryDef(
      (s, d) => graft.operators.PageRank.runWeighted(
        graft.operators.PageRank.tradeEdgesWeighted(s, d),
        "cust", "supp", "w", iters = 3),
      Some(weightedPrOracleSql)),

    // Event path mining: per-user chronological event-type trigrams
    // (two leads over (ts, event_id)), global top-20 — the sequence-
    // pattern summary beside q270's first-order transitions.
    "q303_path_ngrams" -> QueryDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val t = Tables.events(s, d)
          .select(col("user_id"), col("event_type").as("e0"),
            col("ts"), col("event_id"))
          .withColumn("e1", lead(col("e0"), 1).over(w))
          .withColumn("e2", lead(col("e0"), 2).over(w))
          .filter(col("e1").isNotNull && col("e2").isNotNull)
          .select(concat_ws(">", col("e0"), col("e1"), col("e2")).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
        graft.operators.Sorts.topK(t, Seq("n", "path"), Seq(false, true), 20)
      },
      Some("""WITH t AS (SELECT event_type AS e0,
            lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
            lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2
          FROM events),
          p AS (SELECT e0 || '>' || e1 || '>' || e2 AS path,
              CAST(count(*) AS BIGINT) AS n
            FROM t WHERE e1 IS NOT NULL AND e2 IS NOT NULL GROUP BY 1)
          SELECT path, n FROM p
          QUALIFY row_number() OVER (ORDER BY n DESC, path) <= 20"""))
  )

  /** q302 oracle: 3 unrolled weighted iterations (`(pr·w) // sw`). */
  private def weightedPrOracleSql: String = {
    val s = graft.operators.PageRank.Scale.toString
    def iter(k: Int, prev: String) =
      s"""m$k AS (SELECT e.dst AS id, sum((p.pr * e.w) // p.sw) AS mass
            FROM e JOIN $prev p ON e.src = p.id GROUP BY 1),
          p$k AS (SELECT v.id, v.sw,
              ((3 * $s) // (20 * nn.n)) + (85 * coalesce(m$k.mass, 0)) // 100 AS pr
            FROM v CROSS JOIN nn LEFT JOIN m$k ON m$k.id = v.id)"""
    s"""WITH e0 AS (SELECT
            'c' || CAST(o_custkey AS VARCHAR) AS src,
            's' || CAST(l_suppkey AS VARCHAR) AS dst,
            CAST(count(*) AS BIGINT) AS w
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1, 2),
        e AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
              SELECT src, dst, w FROM e0
              UNION ALL SELECT dst AS src, src AS dst, w FROM e0)
            GROUP BY 1, 2),
        v AS (SELECT src AS id, CAST(sum(w) AS BIGINT) AS sw FROM e GROUP BY 1),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        p0 AS (SELECT id, sw, ($s // n) AS pr FROM v CROSS JOIN nn),
        ${iter(1, "p0")}, ${iter(2, "p1")}, ${iter(3, "p2")}
        SELECT id, sw, CAST(pr AS BIGINT) AS pr FROM p3"""
  }
}
