package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Round-17 additions: cohort retention, Markov event transitions, and
  * histogram-sketch quantile estimation.
  */
object Round17Queries {

  private val WeekUs = 604800000000L // 7·24·3600·10^6

  val defs: Seq[(String, QueryDef)] = Seq(

    // Cohort retention: users bucketed by first-signup week, activity
    // counted per week offset.  All time math is integer µs `div` —
    // exact, replayable, and safe beyond 2^53 (double division on epoch
    // micros would be off-by-one at the week edges).  Shape: one
    // groupBy(user) + one join + one distinct + one groupBy — every
    // stage partial-aggregates.
    "q269_cohort_retention" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        val cohort = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("st"))
          .select(col("user_id"), expr(s"unix_micros(st) div $WeekUs").as("cw"))
        ev.join(cohort, "user_id")
          .select(col("user_id"), col("cw"),
            (expr(s"unix_micros(ts) div $WeekUs") - col("cw")).as("off"))
          .filter(col("off") >= 0)
          .distinct()
          .groupBy("cw", "off")
          .agg(count(lit(1)).as("n_users"))
      },
      Some(s"""WITH su AS (SELECT user_id, min(ts) AS st FROM events
            WHERE event_type = 'signup' GROUP BY 1),
          co AS (SELECT user_id, epoch_us(st) // $WeekUs AS cw FROM su),
          a AS (SELECT DISTINCT e.user_id, co.cw,
              (epoch_us(e.ts) // $WeekUs) - co.cw AS off
            FROM events e JOIN co ON e.user_id = co.user_id
            WHERE (epoch_us(e.ts) // $WeekUs) - co.cw >= 0)
          SELECT cw, off, CAST(count(*) AS BIGINT) AS n_users
          FROM a GROUP BY 1, 2""")),

    // Markov transition matrix of the event stream: per-user
    // chronological next-event pairs (lead over (ts, event_id) — the
    // unique-id tiebreak keeps the order deterministic), transition
    // probability = exact long count over the exact per-source total
    // (one double division, identical both engines).
    "q270_transitions" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wp = Window.partitionBy("src")
        Tables.events(s, d)
          .select(col("user_id"), col("event_type").as("src"),
            col("ts"), col("event_id"))
          .withColumn("dst", lead(col("src"), 1).over(w))
          .filter(col("dst").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("n"))
          .select(col("src"), col("dst"), col("n"),
            (col("n").cast("double") / sum(col("n")).over(wp).cast("double")).as("p"))
      },
      Some("""WITH t AS (SELECT event_type AS src,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
          FROM events),
          c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
            FROM t WHERE dst IS NOT NULL GROUP BY 1, 2)
          SELECT src, dst, n,
            CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE) AS p
          FROM c""")),

    // Histogram-sketch quantiles: per-group equi-width 32-bucket
    // histogram (two linear passes, q247's IEEE bucket math), quantile
    // estimate = upper edge of the first bucket whose cumulative count
    // reaches ceil(q·n).  The mergeable, bounded-state alternative to
    // an exact sort at 100 TB; Round17Spec pins |est − exact| ≤ width.
    "q271_hist_quantiles" -> QueryDef(
      (s, d) => {
        val nb = 32
        val ev = Tables.events(s, d).filter(col("value").isNotNull)
        val stats = ev.groupBy("event_type")
          .agg(min("value").as("mn"), max("value").as("mx"), count(lit(1)).as("n"))
        val buckets = ev.join(broadcast(stats), "event_type")
          .select(col("event_type"), col("mn"), col("mx"), col("n"),
            least(floor((col("value") - col("mn")) / ((col("mx") - col("mn")) / lit(nb.toDouble))),
              lit(nb - 1L)).as("bucket"))
          .groupBy("event_type", "mn", "mx", "n", "bucket")
          .agg(count(lit(1)).as("c"))
        val wCum = Window.partitionBy("event_type").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = buckets.withColumn("cum", sum(col("c")).over(wCum))
        def est(q: Double, name: String) =
          min(when(col("cum") >= ceil(lit(q) * col("n")), col("bucket"))).as(name)
        cum.groupBy("event_type", "mn", "mx", "n")
          .agg(est(0.5, "b50"), est(0.9, "b90"), est(0.99, "b99"))
          .select(col("event_type"), col("n"),
            (col("mn") + (col("b50") + 1).cast("double") * ((col("mx") - col("mn")) / lit(nb.toDouble))).as("p50_est"),
            (col("mn") + (col("b90") + 1).cast("double") * ((col("mx") - col("mn")) / lit(nb.toDouble))).as("p90_est"),
            (col("mn") + (col("b99") + 1).cast("double") * ((col("mx") - col("mn")) / lit(nb.toDouble))).as("p99_est"))
      },
      Some("""WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
          s AS (SELECT event_type, min(value) AS mn, max(value) AS mx,
              CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1),
          b AS (SELECT ev.event_type, s.mn, s.mx, s.n,
              CAST(least(floor((ev.value - s.mn) / ((s.mx - s.mn) / 32.0)), 31) AS BIGINT) AS bucket
            FROM ev JOIN s ON ev.event_type = s.event_type),
          c AS (SELECT event_type, mn, mx, n, bucket, count(*) AS c
            FROM b GROUP BY 1, 2, 3, 4, 5),
          cu AS (SELECT event_type, mn, mx, n, bucket,
              sum(c) OVER (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM c),
          q AS (SELECT event_type, mn, mx, n,
              min(CASE WHEN cum >= ceil(0.5 * n) THEN bucket END) AS b50,
              min(CASE WHEN cum >= ceil(0.9 * n) THEN bucket END) AS b90,
              min(CASE WHEN cum >= ceil(0.99 * n) THEN bucket END) AS b99
            FROM cu GROUP BY 1, 2, 3, 4)
          SELECT event_type, n,
            mn + CAST(b50 + 1 AS DOUBLE) * ((mx - mn) / 32.0) AS p50_est,
            mn + CAST(b90 + 1 AS DOUBLE) * ((mx - mn) / 32.0) AS p90_est,
            mn + CAST(b99 + 1 AS DOUBLE) * ((mx - mn) / 32.0) AS p99_est
          FROM q""")),

    // §2.10 streaming funnel: the q267 report maintained as a running
    // streaming aggregation (state = 3 first-touch timestamps per
    // user); bounded replay ⇒ batch answer ⇒ q267's oracle.
    "q272_stream_funnel" -> QueryDef(
      (s, d) => graft.streaming.EventStreams.funnelStream(s, d),
      Some(Round16Queries.funnelOracleSql)),

    // pandas combine_first: index-aligned hole-filling union — self's
    // non-null values win, other fills missing rows and null cells.
    // ONE full-outer hash join + codegen'd coalesce projections.
    "q273_combine_first" -> QueryDef(
      (s, d) => {
        import graft.api.GFrame
        val o = Tables.orders(s, d)
        val self = o.filter(col("o_orderkey") % 3 =!= 0)
          .select(col("o_orderkey"), col("o_custkey"),
            when(col("o_orderkey") % 5 === 0, lit(null).cast("double"))
              .otherwise(col("o_totalprice")).as("o_totalprice"))
        val other = o.filter(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_custkey", "o_totalprice")
        GFrame(self, Seq("o_orderkey"))
          .combineFirst(GFrame(other, Seq("o_orderkey"))).df
      },
      Some("""WITH s AS (SELECT o_orderkey, o_custkey,
            CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 3 != 0),
          o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE o_orderkey % 2 = 0)
          SELECT coalesce(s.o_orderkey, o.o_orderkey) AS o_orderkey,
            coalesce(s.o_custkey, o.o_custkey) AS o_custkey,
            coalesce(s.o_totalprice, o.o_totalprice) AS o_totalprice
          FROM s FULL OUTER JOIN o ON s.o_orderkey = o.o_orderkey""")),

    // pandas update: other's NON-null values overwrite self on shared
    // labels; self's row set and columns are kept (one left join —
    // null cells in other never clobber, as in pandas).
    "q274_update" -> QueryDef(
      (s, d) => {
        import graft.api.GFrame
        val o = Tables.orders(s, d)
        val self = o.select("o_orderkey", "o_custkey", "o_totalprice")
        val other = o.filter(col("o_orderkey") % 4 === 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 8 === 0, lit(null).cast("double"))
              .otherwise(col("o_totalprice") * 2).as("o_totalprice"))
        GFrame(self, Seq("o_orderkey"))
          .updateFrom(GFrame(other, Seq("o_orderkey"))).df
      },
      Some("""WITH o AS (SELECT o_orderkey,
            CASE WHEN o_orderkey % 8 = 0 THEN NULL ELSE o_totalprice * 2 END AS o_totalprice
          FROM orders WHERE o_orderkey % 4 = 0)
          SELECT s.o_orderkey, s.o_custkey,
            coalesce(o.o_totalprice, s.o_totalprice) AS o_totalprice
          FROM orders s LEFT JOIN o ON s.o_orderkey = o.o_orderkey""")),

    // pandas unstack (stack's inverse): innermost index level pivots
    // to columns via one hash agg with an explicit dictionary —
    // (source × lang) doc counts in wide form.  Round17Spec pins the
    // stack→unstack round-trip.
    "q275_unstack" -> QueryDef(
      (s, d) => {
        import graft.api.GFrame
        val counts = Tables.documents(s, d)
          .groupBy("source", "lang").agg(count(lit(1)).as("value"))
        GFrame(counts, Seq("source", "lang"))
          .unstack(pivotValues = Some(Seq("de", "en", "es", "fr", "zh"))).df
      },
      Some("""SELECT source,
            CAST(sum(CASE WHEN lang = 'de' THEN 1 END) AS BIGINT) AS de,
            CAST(sum(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS en,
            CAST(sum(CASE WHEN lang = 'es' THEN 1 END) AS BIGINT) AS es,
            CAST(sum(CASE WHEN lang = 'fr' THEN 1 END) AS BIGINT) AS fr,
            CAST(sum(CASE WHEN lang = 'zh' THEN 1 END) AS BIGINT) AS zh
          FROM documents GROUP BY 1"""))
  )
}
