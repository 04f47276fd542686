package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num
import graft.text.MinHash

/** Round-41 additions: streaming per-day approx DAU, Jaccard
  * threshold-tuning histogram.
  */
object Round41Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // §2.10 STREAMING approximate DAU: one KMV sketch per day — the
    // windowed sketch-as-state pattern (q343 keyed by time bucket);
    // state is day-grid × 64 hashes regardless of traffic.  The
    // oracle replays each day's deterministic sketch.
    "q368_stream_dau_kmv" -> QueryDef(
      (s, d) => graft.streaming.EventStreams.dauKmvStream(s, d),
      Some("""WITH d AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
              substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12) AS h
            FROM events),
          r AS (SELECT day, h,
              row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM d),
          sk AS (SELECT day, CAST(count(*) AS BIGINT) AS n_h, max(h) AS mx
            FROM r WHERE rn <= 64 GROUP BY 1)
          SELECT day,
            round((CASE WHEN n_h < 64 THEN CAST(n_h AS DOUBLE)
              ELSE 63.0 / (CAST(CAST('0x' || mx AS BIGINT) AS DOUBLE)
                / power(16, 12)) END) * 1e3) / 1e3 AS dau_est
          FROM sk""")),

    // Near-dup Jaccard histogram (threshold-tuning report): the
    // verified LSH pairs at t=0.5 binned by similarity decile — how a
    // dedup threshold gets picked before committing a 100 TB rewrite.
    // Bins ride on q55's measured-full-recall operating point, so the
    // exact inverted-index pairs are the oracle.
    "q369_jaccard_histogram" -> QueryDef(
      (s, d) => MinHash.nearDuplicates(Tables.documents(s, d), "doc_id", "text",
          n = 3, threshold = 0.5)
        .select(least(floor(Num.rnd(col("jaccard"), 6) * 10), lit(9.0))
          .cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n_pairs")),
      Some(s"""WITH ${TextQueries.pairsOracleCtes}
          SELECT CAST(least(floor(round(jaccard * 1e6) / 1e6 * 10), 9) AS BIGINT)
            AS bin, CAST(count(*) AS BIGINT) AS n_pairs
          FROM pairs GROUP BY 1"""))
  )
}
