package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num
import graft.similarity.Similarity

/** Round-37 additions: streaming Benford monitor, hopping-window
  * distinct users, bucket-sampled cosine-similarity histogram.
  */
object Round37Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // §2.10 STREAMING Benford monitor (q330's twin over a staged
    // orders stream): state = 9 digit cells; χ² in batch over the
    // sink.  Same oracle as q330.
    "q355_stream_benford" -> QueryDef(
      (s, d) => graft.streaming.EventStreams.benfordStream(s, d),
      Round29Queries.defs.toMap.apply("q330_benford").oracle),

    // Distinct users per 1h/30min hopping window — the sliding-reach
    // metric: each event lands in exactly two windows (q286's
    // two-starts oracle), the count is exact per window.
    "q356_hopping_distinct_users" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(unix_timestamp(col("window.start")).as("ws"), col("n_users")),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
          w AS (SELECT user_id, (t // 1800000000) * 1800000000 AS ws FROM e
                UNION ALL
                SELECT user_id, (t // 1800000000) * 1800000000 - 1800000000 FROM e)
          SELECT ws // 1000000 AS ws,
            CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM w GROUP BY 1""")),

    // Pairwise cosine-similarity histogram (corpus-geometry report):
    // pairs are BUCKET-SAMPLED — only ids in the same mod-16 bucket
    // pair up, a deterministic 1/16 sample of all pairs that keeps
    // the join linear in (n/16)² per bucket instead of n² global —
    // then 32 equi-width bins over [-1, 1].  The scale knob is the
    // bucket count; the oracle replays the identical sample.
    "q357_cosine_histogram" -> QueryDef(
      (s, d) => {
        val em = Tables.embeddings(s, d)
          .select(col("vec_id"), pmod(col("vec_id"), lit(16)).as("bk"),
            col("embedding").as("cv"))
        val right = em.select(col("vec_id").as("id2"), col("bk").as("bk2"),
          col("cv").as("cv2"))
        val cos = em.join(right,
            col("bk") === col("bk2") && col("vec_id") < col("id2"))
          .select(Num.rnd(Similarity.dotComposed(col("cv"), col("cv2"))
            / (sqrt(Similarity.dotComposed(col("cv"), col("cv")))
              * sqrt(Similarity.dotComposed(col("cv2"), col("cv2")))), 6).as("c"))
        cos.select(least(floor((col("c") + 1.0) * 16).cast("long"), lit(31L))
            .as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
      },
      Some(s"""WITH em AS (SELECT vec_id, vec_id % 16 AS bk, embedding AS cv
              FROM embeddings),
          cos AS (SELECT round(${SimilarityQueries.sqlCos("a.cv", "b.cv")}
                * 1e6) / 1e6 AS c
            FROM em a JOIN em b ON a.bk = b.bk AND a.vec_id < b.vec_id)
          SELECT CAST(least(floor((c + 1.0) * 16), 31) AS BIGINT) AS bin,
            CAST(count(*) AS BIGINT) AS n_pairs
          FROM cos GROUP BY 1"""))
  )
}
