package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num
import graft.text.BigramLm

/** Round-19 additions: CUBE aggregation, curriculum split by LM-score
  * terciles, hopping-window aggregation.
  */
object Round19Queries {

  /** Shared by q288 (batch) and q289 (streaming twin). */
  private[queries] val olsOracleSql: String =
    """WITH t0 AS (SELECT min(epoch_us(ts)) AS t0 FROM events
            WHERE value IS NOT NULL),
          e AS (SELECT event_type,
              CAST((epoch_us(ts) - t0.t0) // 60000000 AS DECIMAL(18,0)) AS tm,
              CAST(round(value * 1e6) / 1e6 AS DECIMAL(18,6)) AS vr
            FROM events, t0 WHERE value IS NOT NULL),
          m AS (SELECT event_type,
              CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(tm) AS DOUBLE) AS st,
              CAST(sum(vr) AS DOUBLE) AS sv,
              CAST(sum(tm * vr) AS DOUBLE) AS stv,
              CAST(sum(tm * tm) AS DOUBLE) AS stt
            FROM e GROUP BY 1)
          SELECT event_type,
            round((n * stv - st * sv) / (n * stt - st * st) * 1e12) / 1e12 + 0 AS slope,
            round((sv - (n * stv - st * sv) / (n * stt - st * st) * st) / n * 1e6) / 1e6 + 0 AS intercept
          FROM m"""

  val defs: Seq[(String, QueryDef)] = Seq(

    // §2.4 CUBE (all 2^k grouping sets in one pass — the expand-based
    // companion of q74's ROLLUP): per (source, lang) doc counts with
    // all marginals.
    "q284_cube" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .cube("source", "lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
        .select(coalesce(col("source"), lit("__all__")).as("src"),
          coalesce(col("lang"), lit("__all__")).as("lg"),
          col("n"), col("sc")),
      Some("""SELECT COALESCE(source, '__all__') AS src,
            COALESCE(lang, '__all__') AS lg,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(n_chars) AS BIGINT) AS sc
          FROM documents GROUP BY CUBE (source, lang)""")),

    // Curriculum split by LM fluency: tercile thresholds via exact
    // percentiles (two linear passes + a 1-row broadcast — NEVER an
    // ntile over a single-partition global window), bucket = head /
    // middle / tail.  The data-ordering stage of curriculum training.
    "q285_curriculum_split" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val (pu, pb) = BigramLm.tables(docs, "text")
        val scored = docs.select(col("doc_id"),
          BigramLm.score(col("text"), pu, pb).as("fluency"))
        val cuts = scored.agg(
          expr("percentile(fluency, 0.3333333333333333)").as("t1"),
          expr("percentile(fluency, 0.6666666666666666)").as("t2"))
        scored.crossJoin(broadcast(cuts))
          .select(col("doc_id"), Num.rnd(col("fluency"), 6).as("fluency"),
            when(col("fluency") <= col("t1"), lit("tail"))
              .when(col("fluency") <= col("t2"), lit("middle"))
              .otherwise(lit("head")).as("bucket"))
      },
      Some(s"""WITH sc AS (${Round16Queries.bigramScoreSql}),
          cuts AS (SELECT quantile_cont(fluency, 0.3333333333333333) AS t1,
              quantile_cont(fluency, 0.6666666666666666) AS t2 FROM sc)
          SELECT doc_id, round(fluency * 1e6) / 1e6 AS fluency,
            CASE WHEN fluency <= t1 THEN 'tail'
                 WHEN fluency <= t2 THEN 'middle'
                 ELSE 'head' END AS bucket
          FROM sc CROSS JOIN cuts""")),

    // §2.10 hopping-window aggregation (size 1h, slide 30min — each
    // event lands in exactly two windows): Spark's native sliding
    // window() against an oracle that materializes both window starts
    // per event with integer-µs floor math.  Sums go through
    // DECIMAL(18,6) so the doubled row multiplicity can't surface
    // order ulps.
    "q286_hopping_window" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(Num.rnd(col("value"), 6).cast("decimal(18,6)")).as("sv"))
        .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"),
          col("n"), col("sv").cast("double").as("sv")),
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS t,
            CAST(round(value * 1e6) / 1e6 AS DECIMAL(18,6)) AS vr
          FROM events),
          w AS (SELECT event_type, vr, (t // 1800000000) * 1800000000 AS ws FROM e
                UNION ALL
                SELECT event_type, vr, (t // 1800000000) * 1800000000 - 1800000000 FROM e)
          SELECT ws // 1000000 AS ws, event_type,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(vr) AS DOUBLE) AS sv
          FROM w GROUP BY 1, 2""")),

    // §2.12 MMR diversity selection (Carbonell & Goldstein 1998):
    // relevance shortlist computed distributed (q58's brute path; any
    // ANN route at scale), the inherently-sequential greedy λ-tradeoff
    // on the driver over the BOUNDED pool (32² sims — the Misra-Gries
    // bounded-certification pattern).  Driver arithmetic replays the
    // engines' exact fold, so the oracle unrolls the k greedy steps.
    "q287_mmr_diversity" -> QueryDef(
      (s, d) => graft.similarity.Mmr.select(
        Tables.embeddings(s, d), queryId = 0L, pool = 32, k = 8,
        lambda = 0.7, mu = 0.3),
      Some(mmrOracleSql(pool = 32, k = 8))),

    // Group-wise OLS trend fitting: per event_type regress value on
    // time.  All four moments (Σt, Σv, Σtv, Σt²) accumulate as EXACT
    // decimals — time is rescaled to integer minutes since the corpus
    // start so t² stays inside 38 digits (raw epoch-µs squares would
    // overflow) — then slope/intercept are the same double expression
    // on both engines.  One pass for min-ts, one grouped aggregate.
    "q288_groupwise_ols" -> QueryDef(
      (s, d) => {
        import graft.functions.Num
        val ev = Tables.events(s, d).filter(col("value").isNotNull)
        val t0 = ev.agg(min(expr("unix_micros(ts)")).as("t0"))
        val m = ev.crossJoin(broadcast(t0))
          .select(col("event_type"),
            expr("(unix_micros(ts) - t0) div 60000000").cast("decimal(18,0)").as("tm"),
            Num.rnd(col("value"), 6).cast("decimal(18,6)").as("vr"))
          .groupBy("event_type")
          .agg(count(lit(1)).cast("double").as("n"),
            sum(col("tm")).cast("double").as("st"),
            sum(col("vr")).cast("double").as("sv"),
            sum(col("tm") * col("vr")).cast("double").as("stv"),
            sum(col("tm") * col("tm")).cast("double").as("stt"))
        m.select(col("event_type"),
          Num.rnd((col("n") * col("stv") - col("st") * col("sv"))
            / (col("n") * col("stt") - col("st") * col("st")), 12).as("slope"),
          Num.rnd((col("sv") - (col("n") * col("stv") - col("st") * col("sv"))
            / (col("n") * col("stt") - col("st") * col("st")) * col("st")) / col("n"), 6)
            .as("intercept"))
      },
      Some(olsOracleSql))
  )


  /** Unrolled greedy MMR in SQL: sₖ cross-joins the single-row previous
    * selections, excludes them, and argmaxes the identical
    * `0.7·rel − 0.3·greatest(sims)` expression with min-id ties.
    */
  private def mmrOracleSql(pool: Int, k: Int): String = {
    def sim(a: String, b: String): String =
      s"round(${SimilarityQueries.sqlCos(a, b)} * 1e6) / 1e6"
    val steps = (1 to k).map { i =>
      if (i == 1)
        s"""s1 AS (SELECT vec_id, cv, rel FROM top
             QUALIFY row_number() OVER (ORDER BY 0.7 * rel DESC, vec_id) = 1)"""
      else {
        val prev = (1 until i).map(j => s"s$j").mkString(", ")
        val excl = (1 until i).map(j => s"t.vec_id != s$j.vec_id").mkString(" AND ")
        val sims = (1 until i).map(j => sim("t.cv", s"s$j.cv"))
        val diversity = if (sims.size == 1) sims.head
          else s"greatest(${sims.mkString(", ")})"
        s"""s$i AS (SELECT t.vec_id, t.cv, t.rel FROM top t, $prev
             WHERE $excl
             QUALIFY row_number() OVER
               (ORDER BY 0.7 * t.rel - 0.3 * ($diversity) DESC, t.vec_id) = 1)"""
      }
    }.mkString(",\n")
    val out = (1 to k).map(i =>
      s"SELECT vec_id, rel, CAST($i AS BIGINT) AS rank FROM s$i").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        c AS (SELECT vec_id, embedding AS cv,
            round(${SimilarityQueries.sqlCos("embedding", "qv")} * 1e6) / 1e6 AS rel
          FROM embeddings, q WHERE vec_id != 0),
        top AS (SELECT vec_id, cv, rel FROM c
          QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) <= $pool),
        $steps
        $out"""
  }
}
