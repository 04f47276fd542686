package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num
import graft.similarity.Similarity

/** Round-52 additions (build round 12, wave 8):
  *
  *  - q421 streaming chunk-index probe — the live-ingest twin of q419
  *    (stream-static join against the persisted CDC chunk index);
  *  - q422 truncated-prefix ANN ("Matryoshka" two-stage): coarse rank
  *    by the first-16-dim dot product (4× cheaper per pair), exact
  *    cosine rerank of the bounded shortlist. The recipe
  *    dimension-reduced embedding stacks ship with; composes with IVF
  *    pruning at scale (the coarse metric replaces the full dot inside
  *    each probed cell).
  */
object Round52Queries {

  private val pfx = 16   // coarse prefix dims
  private val shortM = 50 // coarse shortlist size
  private val outK = 5

  val defs: Seq[(String, QueryDef)] = Seq(

    "q421_stream_chunk_probe" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.chunkIndexProbeStream(s, d, 8),
      // same contract as q419 — the batch oracle gates the stream
      Round51Queries.defs.toMap.apply("q419_chunk_index_probe").oracle),

    "q422_ann_prefix_rerank" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            slice(col("embedding"), 1, pfx).as("qp"),
            Similarity.norm(col("embedding")).as("qn"))
        val c = e.select(col("vec_id").as("vid"), col("embedding").as("cv"),
          slice(col("embedding"), 1, pfx).as("cp"),
          Similarity.norm(col("embedding")).as("cn"))
        val coarse = c.crossJoin(broadcast(q))
          .filter(col("vid") =!= col("qid"))
          .withColumn("pd", Num.rnd(Similarity.dot(col("qp"), col("cp")), 6))
        val w1 = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("pd").desc, col("vid").asc)
        val short = coarse.withColumn("r1", row_number().over(w1))
          .filter(col("r1") <= shortM)
        val w2 = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("sim").desc, col("vid").asc)
        short
          .withColumn("sim", Num.rnd(
            Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
          .withColumn("rn", row_number().over(w2).cast("long"))
          .filter(col("rn") <= outK)
          .select(col("qid"), col("vid"), col("sim"), col("rn"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv,
               embedding[1:$pfx] AS qp FROM embeddings WHERE vec_id < 8),
             c AS (SELECT vec_id AS vid, embedding AS cv,
               embedding[1:$pfx] AS cp FROM embeddings),
             coarse AS (SELECT q.qid, c.vid, q.qv, c.cv,
                 round(${SimilarityQueries.sqlDotPub("q.qp", "c.cp")} * 1e6) / 1e6 AS pd
               FROM c, q WHERE c.vid != q.qid),
             short AS (SELECT qid, vid, qv, cv FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY pd DESC, vid ASC) AS r1 FROM coarse)
               WHERE r1 <= $shortM),
             exact AS (SELECT qid, vid,
                 round(${SimilarityQueries.sqlCosPub("qv", "cv")} * 1e6) / 1e6 AS sim
               FROM short)
             SELECT qid, vid, sim, rn FROM (
               SELECT qid, vid, sim,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY sim DESC, vid ASC) AS BIGINT) AS rn
               FROM exact) WHERE rn <= $outK"""))
  )
}
