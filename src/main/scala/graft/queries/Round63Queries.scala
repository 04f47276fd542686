package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Round-63 additions (build round 13, wave 6):
  *
  *  - q450 SHARD MANIFEST: the reproducibility artifact a packed
  *    training dataset ships — documents ranked in the deterministic
  *    md5 training order (two-phase bucketed rank, no global window),
  *    cut into 64-doc shards, each shard reporting doc/token counts,
  *    rank range, and an order-sensitive md5 of its id sequence (the
  *    checksum a dataloader verifies before a run).
  *  - q451 STREAMING PSI drift monitor: the live half of q447 — the
  *    reference histogram is a tiny batch aggregate, the arriving
  *    split folds into a bounded (source × bucket) running histogram,
  *    and the PSI arithmetic runs over two tiny tables.
  */
object Round63Queries {

  private val DocsPerShard = 64L
  private val NBUCKET = 8

  val defs: Seq[(String, QueryDef)] = Seq(

    "q450_shard_manifest" -> QueryDef(
      (s, d) => {
        val keyed = Tables.documents(s, d)
          .select(col("doc_id"),
            size(filter(split(col("text"), " "), x => x =!= ""))
              .cast("long").as("n_tok"))
          .withColumn("h", md5(concat(lit("sh:"), col("doc_id").cast("string"))))
          .withColumn("b", substring(col("h"), 1, 2))
        val offs = keyed.groupBy("b").agg(count(lit(1)).as("c"))
          .withColumn("off", coalesce(
            sum("c").over(Window.orderBy("b")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("b", "off")
        val ranked = keyed.join(broadcast(offs), Seq("b"))
          .withColumn("rk", col("off") + row_number()
            .over(Window.partitionBy("b").orderBy("h")).cast("long"))
          .withColumn("shard", ((col("rk") - 1) / DocsPerShard).cast("long"))
        ranked.groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tok").as("n_tokens"),
            min("rk").as("first_rank"),
            max("rk").as("last_rank"),
            md5(concat_ws(",",
              transform(array_sort(collect_list(struct(col("rk"), col("doc_id")))),
                x => x.getField("doc_id").cast("string")))).as("ids_md5"))
      },
      Some(s"""WITH r AS (SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS BIGINT) AS n_tok,
               CAST(row_number() OVER (
                 ORDER BY md5('sh:' || CAST(doc_id AS VARCHAR))) AS BIGINT) AS rk
             FROM documents)
             SELECT CAST((rk - 1) // $DocsPerShard AS BIGINT) AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               min(rk) AS first_rank, max(rk) AS last_rank,
               md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rk)) AS ids_md5
             FROM r GROUP BY 1""")),

    "q451_stream_psi" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.psiStream(s, d, NBUCKET),
      Some(s"""WITH hb AS (SELECT source,
               least(len(list_filter(string_split(text, ' '), x -> x <> ''))
                 // 10, ${NBUCKET - 1}) AS bucket, count(*) AS c
             FROM documents WHERE doc_id % 10 != 0 GROUP BY 1, 2),
             hn AS (SELECT source,
               least(len(list_filter(string_split(text, ' '), x -> x <> ''))
                 // 10, ${NBUCKET - 1}) AS bucket, count(*) AS c
             FROM documents WHERE doc_id % 10 = 0 GROUP BY 1, 2),
             j AS (SELECT COALESCE(hb.source, hn.source) AS source,
                 COALESCE(hb.bucket, hn.bucket) AS bucket,
                 hb.c AS cb0, hn.c AS cn0
               FROM hb FULL OUTER JOIN hn
                 ON hb.source = hn.source AND hb.bucket = hn.bucket),
             jt AS (SELECT source, bucket,
                 COALESCE(cb0, 0) AS cb, COALESCE(cn0, 0) AS cn,
                 sum(cb0) OVER (PARTITION BY source) AS nb,
                 sum(cn0) OVER (PARTITION BY source) AS nn
               FROM j),
             agg AS (SELECT source,
                 sum(CAST(round(((cb + 1.0) / (nb + $NBUCKET)
                     - (cn + 1.0) / (nn + $NBUCKET)) *
                   ln(((cb + 1.0) / (nb + $NBUCKET))
                     / ((cn + 1.0) / (nn + $NBUCKET))), 6) AS DECIMAL(18,6)))
                   AS present,
                 count(*) AS k,
                 any_value(nb) AS nb, any_value(nn) AS nn
               FROM jt GROUP BY 1)
             SELECT source, CAST(present + ($NBUCKET - k) *
                 CAST(round((1.0 / (nb + $NBUCKET) - 1.0 / (nn + $NBUCKET)) *
                   ln((1.0 / (nb + $NBUCKET)) / (1.0 / (nn + $NBUCKET))), 6)
                   AS DECIMAL(18,6)) AS DOUBLE) AS psi
             FROM agg""")),

    // Ingest-time twin of q448: the rule chain is stateless per row;
    // state = the (source, reason) running counts only. Same oracle.
    "q452_stream_reject_audit" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.rejectAuditStream(
        s, d, Round62Queries.reasonCol),
      Round62Queries.defs.collectFirst {
        case ("q448_reject_audit", q) => q.oracle.get
      })
  )
}
