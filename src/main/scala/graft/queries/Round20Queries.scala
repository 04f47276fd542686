package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num

/** Round-20 additions: streaming OLS monitor, hash-bootstrap
  * confidence intervals, two-sample Kolmogorov-Smirnov drift.
  */
object Round20Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // §2.10 streaming OLS: the q288 moments as five decimal-exact
    // numbers of stream state per type (same oracle — bounded replay
    // equals batch).
    "q289_stream_ols" -> QueryDef(
      (s, d) => graft.streaming.EventStreams.olsStream(s, d),
      Some(Round19Queries.olsOracleSql)),

    // Hash-bootstrap confidence intervals (deterministic Poisson-style
    // bootstrap): every row gets a replayable md5 weight ∈ {0,1,2}
    // (E[w]=1) per resample b; the B=32 per-(type,b) means accumulate
    // as exact decimal weighted sums in ONE aggregate over an explode
    // (no data reshuffle per resample — the classic Poisson-bootstrap
    // trick for error bars at scale), then the CI is an exact
    // percentile over the 32 tiny values.
    "q290_bootstrap_ci" -> QueryDef(
      (s, d) => {
        val B = 32
        val ev = Tables.events(s, d).filter(col("value").isNotNull)
          .select(col("event_id"), col("event_type"),
            Num.rnd(col("value"), 6).cast("decimal(18,6)").as("vr"))
        val res = ev.select(col("event_id"), col("event_type"), col("vr"),
            explode(sequence(lit(0), lit(B - 1))).as("b"))
          .withColumn("w",
            (conv(substring(md5(concat(lit("bs"), col("b"), lit(":"),
              col("event_id"))), 1, 4), 16, 10).cast("int") % 3)
              .cast("decimal(2,0)"))
          .groupBy("event_type", "b")
          .agg((sum(col("vr") * col("w")).cast("double")
            / sum(col("w")).cast("double")).as("mean_b"))
        val point = ev.groupBy("event_type")
          .agg((sum(col("vr")).cast("double") / count(lit(1))).as("mean"))
        res.groupBy("event_type")
          .agg(expr("percentile(mean_b, 0.05)").as("lo"),
            expr("percentile(mean_b, 0.95)").as("hi"))
          .join(point, "event_type")
          .select(col("event_type"), Num.rnd(col("mean"), 6).as("mean"),
            Num.rnd(col("lo"), 6).as("lo"), Num.rnd(col("hi"), 6).as("hi"))
      },
      Some("""WITH ev AS (SELECT event_id, event_type,
            CAST(round(value * 1e6) / 1e6 AS DECIMAL(18,6)) AS vr
          FROM events WHERE value IS NOT NULL),
          r AS (SELECT event_id, event_type, vr, unnest(range(32)) AS b FROM ev),
          w AS (SELECT event_type, vr, b,
              CAST(CAST(('0x' || substr(md5('bs' || CAST(b AS VARCHAR) || ':' ||
                CAST(event_id AS VARCHAR)), 1, 4)) AS INT) % 3 AS DECIMAL(2,0)) AS w
            FROM r),
          mb AS (SELECT event_type, b,
              CAST(sum(vr * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS mean_b
            FROM w GROUP BY 1, 2),
          ci AS (SELECT event_type, quantile_cont(mean_b, 0.05) AS lo,
              quantile_cont(mean_b, 0.95) AS hi FROM mb GROUP BY 1),
          pt AS (SELECT event_type,
              CAST(sum(vr) AS DOUBLE) / count(*) AS mean FROM ev GROUP BY 1)
          SELECT ci.event_type, round(pt.mean * 1e6) / 1e6 AS mean,
            round(ci.lo * 1e6) / 1e6 AS lo, round(ci.hi * 1e6) / 1e6 AS hi
          FROM ci JOIN pt ON ci.event_type = pt.event_type""")),

    // Two-sample Kolmogorov-Smirnov drift between two sources'
    // n_chars distributions: D = max |F1 − F2|.  Counts aggregate
    // distributed per value; the CDF walk runs over the BOUNDED
    // distinct-value domain (integer doc lengths — continuous data
    // buckets first, q247-style), so the one ordered window touches
    // only the tiny aggregate.
    "q291_ks_drift" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        def side(src: String, c: String) = docs.filter(col("source") === src)
          .groupBy("n_chars").agg(count(lit(1)).as(c))
        val tot = docs.agg(
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("n1"),
          sum(when(col("source") === "src1", 1L).otherwise(0L)).as("n2"))
        val merged = side("src0", "c1").join(side("src1", "c2"),
            Seq("n_chars"), "full_outer")
          .select(col("n_chars"), coalesce(col("c1"), lit(0L)).as("c1"),
            coalesce(col("c2"), lit(0L)).as("c2"))
        val w = Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        merged.select(col("n_chars"),
            sum(col("c1")).over(w).as("f1"), sum(col("c2")).over(w).as("f2"))
          .crossJoin(broadcast(tot))
          .select(abs(col("f1").cast("double") / col("n1").cast("double")
            - col("f2").cast("double") / col("n2").cast("double")).as("diff"))
          .agg(Num.rnd(max(col("diff")), 6).as("ks_d"))
      },
      Some("""WITH c1 AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS c1
            FROM documents WHERE source = 'src0' GROUP BY 1),
          c2 AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS c2
            FROM documents WHERE source = 'src1' GROUP BY 1),
          m AS (SELECT coalesce(c1.n_chars, c2.n_chars) AS v,
              coalesce(c1.c1, 0) AS c1, coalesce(c2.c2, 0) AS c2
            FROM c1 FULL OUTER JOIN c2 ON c1.n_chars = c2.n_chars),
          f AS (SELECT v,
              sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
              sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
            FROM m),
          t AS (SELECT
              CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS n2
            FROM documents)
          SELECT round(max(abs(CAST(f1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(f2 AS DOUBLE) / CAST(n2 AS DOUBLE))) * 1e6) / 1e6 AS ks_d
          FROM f, t""")),

    // Mann-Whitney U (rank-sum) two-sample test: clicks vs purchases
    // on value.  Ranks come from the DISTRIBUTED RankMethods two-phase
    // scan (never a single-partition global window); average ranks are
    // dyadic halves, so their sum is EXACT in doubles regardless of
    // partial-aggregation order — the oracle replays the identical
    // (min+max)/2 arithmetic over a per-value cum table.
    "q292_mannwhitney" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase")
            && col("value").isNotNull)
          .select(col("event_type"), col("value"))
        val ranked = graft.operators.RankMethods.rank(ev, "value", "r")
        ranked.agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n2"),
            sum(when(col("event_type") === "click", col("r_avg"))
              .otherwise(lit(0.0))).as("r1"))
          .select(col("n1"), col("n2"), col("r1"),
            (col("r1") - expr("(n1 * (n1 + 1)) div 2").cast("double")).as("u"))
      },
      Some("""WITH ev AS (SELECT event_type, value FROM events
            WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
          c AS (SELECT value, CAST(count(*) AS DOUBLE) AS cnt FROM ev GROUP BY 1),
          cu AS (SELECT value, cnt, sum(cnt) OVER (ORDER BY value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM c),
          r AS (SELECT value, ((cum - cnt + 1.0) + cum) / 2.0 AS r_avg FROM cu),
          j AS (SELECT ev.event_type, r.r_avg FROM ev JOIN r ON ev.value = r.value),
          a AS (SELECT
              CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
              sum(CASE WHEN event_type = 'click' THEN r_avg ELSE 0.0 END) AS r1
            FROM j)
          SELECT n1, n2, r1, r1 - CAST((n1 * (n1 + 1)) // 2 AS DOUBLE) AS u FROM a"""))
  )
}
