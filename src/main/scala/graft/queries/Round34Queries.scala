package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num
import graft.similarity.Similarity

/** Round-34 additions: label-outlier detection by centroid cosine,
  * streaming per-group reservoir.
  */
object Round34Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Label-noise candidates: vectors whose cosine to their OWN label
    // centroid falls below 0.1 — the mislabeled-example sweep of
    // embedding-space data cleaning.  Centroids are 6dp-rounded means
    // (bounded label × dim grid, one hash-agg pass) broadcast back;
    // the per-vector cosine is the ordered zip_with fold.  Flagged
    // ids ranked worst-first, top-50 via TakeOrderedAndProject.
    "q350_label_outliers" -> QueryDef(
      (s, d) => {
        val em = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            expr("transform(embedding, v -> cast(v as double))").as("cv"))
        val cent = em.select(col("label"), posexplode(col("cv")).as(Seq("pos", "v")))
          .groupBy("label", "pos")
          .agg(Num.rnd(avg(col("v")), 6).as("m"))
          .groupBy("label")
          .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("s"))
          .select(col("label"), expr("transform(s, x -> x.m)").as("cent"))
        val scored = em.join(broadcast(cent), Seq("label"))
          .select(col("vec_id"), col("label"),
            Num.rnd(Similarity.dotComposed(col("cv"), col("cent"))
              / (sqrt(Similarity.dotComposed(col("cv"), col("cv")))
                * sqrt(Similarity.dotComposed(col("cent"), col("cent")))), 6)
              .as("cos"))
        scored.filter(col("cos") < 0.1)
          .orderBy(col("cos"), col("vec_id")).limit(50)
      },
      Some(s"""WITH ex AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
              gs - 1 AS pos, CAST(v AS DOUBLE) AS v
            FROM (SELECT vec_id, label, unnest(embedding) AS v,
                generate_subscripts(embedding, 1) AS gs FROM embeddings)),
          m AS (SELECT label, pos, round(avg(v) * 1e6) / 1e6 AS m
            FROM ex GROUP BY 1, 2),
          cent AS (SELECT label, list(m ORDER BY pos) AS cent FROM m GROUP BY 1),
          ev AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
              list_transform(embedding, v -> CAST(v AS DOUBLE)) AS cv
            FROM embeddings),
          sc AS (SELECT ev.vec_id, ev.label,
              round(${SimilarityQueries.sqlCos("ev.cv", "cent.cent")} * 1e6) / 1e6 + 0
                AS cos
            FROM ev JOIN cent ON ev.label = cent.label)
          SELECT vec_id, label, cos FROM sc WHERE cos < 0.1
          QUALIFY row_number() OVER (ORDER BY cos, vec_id) <= 50""")),

    // §2.10 STREAMING per-group reservoir (q337's twin): the k
    // smallest salted hashes per source ARE the stream state — the
    // same bounded-merge shape as the KMV sketch, carrying doc ids —
    // maintained by a grouped aggregation over microbatches; the
    // batch answer replays identically.
    "q351_stream_reservoir" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.reservoirStream(s, d, k = 5),
      Round30Queries.defs.toMap.apply("q337_reservoir_sample").oracle)
  )
}
