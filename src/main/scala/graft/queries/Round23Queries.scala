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
          FROM applied GROUP BY 1"""))
  )
}
