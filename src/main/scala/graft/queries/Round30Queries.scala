package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.{JaroWinklerSim, Num}

/** Round-30 additions: Holt double-exponential smoothing, native
  * Jaro-Winkler matching, streaming CUSUM, join-key skew diagnostics,
  * deterministic per-group reservoir sample, IQR outlier profile.
  */
object Round30Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Holt double-exponential smoothing (α=0.3, β=0.2) per event type
    // over the daily mean series: the inherently-sequential recurrence
    // runs as an ordered array fold over the BOUNDED day domain (≤31
    // cells per type — the q293/q316 bounded-fold discipline), never a
    // row-at-a-time loop; the oracle replays the identical recurrence
    // with a recursive CTE.  Outputs final level/trend and the
    // one-step forecast.
    "q333_holt_smoothing" -> QueryDef(
      (s, d) => {
        val e = Tables.events(s, d).filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            Num.rnd(col("value"), 6).cast("decimal(18,6)").as("vr"))
        val daily = e.groupBy("event_type", "day")
          .agg((sum(col("vr")).cast("double") / count(lit(1))).as("x"))
        graft.operators.Stats.holtSmooth(daily, "event_type", "day", "x",
          alpha = 0.3, beta = 0.2)
      },
      Some("""WITH RECURSIVE e AS (SELECT event_type,
              epoch_us(ts) // 86400000000 AS day,
              CAST(round(value * 1e6) / 1e6 AS DECIMAL(18,6)) AS vr
            FROM events WHERE value IS NOT NULL),
          daily AS (SELECT event_type, day,
              CAST(sum(vr) AS DOUBLE) / count(*) AS x FROM e GROUP BY 1, 2),
          ser AS (SELECT event_type, day, x,
              CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS i FROM daily),
          n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
            FROM ser GROUP BY 1),
          rec AS (
            SELECT event_type, i, x AS l, CAST(0 AS DOUBLE) AS b
              FROM ser WHERE i = 1
            UNION ALL
            SELECT r.event_type, s.i,
              0.3 * s.x + 0.7 * (r.l + r.b),
              0.2 * ((0.3 * s.x + 0.7 * (r.l + r.b)) - r.l) + 0.8 * r.b
            FROM rec r JOIN ser s
              ON s.event_type = r.event_type AND s.i = r.i + 1)
          SELECT r.event_type, round(l * 1e6) / 1e6 AS level,
            round(b * 1e6) / 1e6 AS trend,
            round((l + b) * 1e6) / 1e6 AS forecast
          FROM rec r JOIN n ON n.event_type = r.event_type
          WHERE r.i = n.cnt""")),

    // §2.12 Jaro-Winkler fuzzy matching via the native Catalyst
    // expression `functions/JaroWinkler` (codegen'd static call per
    // row — never a Scala UDF), blocked like q322 so the quadratic
    // term stays inside blocks.  Selection threshold applies to the
    // 6dp-ROUNDED similarity on both engines, so the row set is
    // boundary-stable.
    "q334_jaro_winkler" -> QueryDef(
      (s, d) => {
        val names = Tables.part(s, d).select("p_name").distinct()
        val keyed = names.select(col("p_name"),
          element_at(split(col("p_name"), " "), 2).as("blk"))
        keyed.as("x").join(keyed.as("y"),
            col("x.blk") === col("y.blk") && col("x.p_name") < col("y.p_name"))
          .select(col("x.p_name").as("n1"), col("y.p_name").as("n2"),
            Num.rnd(JaroWinklerSim(col("x.p_name"), col("y.p_name")), 6).as("jw"))
          .filter(col("jw") >= 0.8)
      },
      Some("""WITH n AS (SELECT DISTINCT p_name FROM part),
            k AS (SELECT p_name, split_part(p_name, ' ', 2) AS blk FROM n),
            p AS (SELECT x.p_name AS n1, y.p_name AS n2,
                round(jaro_winkler_similarity(x.p_name, y.p_name) * 1e6) / 1e6 AS jw
              FROM k x JOIN k y ON x.blk = y.blk AND x.p_name < y.p_name)
          SELECT n1, n2, jw FROM p WHERE jw >= 0.8""")),

    // §2.10 STREAMING CUSUM changepoint monitor (q325's twin): state =
    // one decimal sum per (event_type, day) cell — bounded by the day
    // grid — with the exact deviation argmax replayed in batch.
    "q335_stream_cusum" -> QueryDef(
      (s, d) => graft.streaming.EventStreams.cusumStream(s, d),
      Round28Queries.defs.toMap.apply("q325_cusum_changepoint").oracle),

    // Join-key skew diagnostics for lineitem.l_partkey (the
    // shuffle-planning report a 100 TB pipeline runs BEFORE picking a
    // join strategy): per-key counts in one pass, then exact
    // percentiles / max-share / coefficient-of-variation from the
    // count distribution, plus the argmax key.  All moments stay in
    // exact integer space until the final double expressions.
    "q336_skew_report" -> QueryDef(
      (s, d) => {
        val c = Tables.lineitem(s, d).groupBy("l_partkey")
          .agg(count(lit(1)).as("c"))
        val top = c.orderBy(col("c").desc, col("l_partkey")).limit(1)
          .select(col("l_partkey").as("top_key"), col("c").as("top_n"))
        val agg = c.agg(
          count(lit(1)).as("n_keys"),
          sum(col("c")).as("tot"),
          max(col("c")).as("mx"),
          sum(col("c") * col("c")).as("ss"),
          expr("percentile(c, 0.5)").as("p50"),
          expr("percentile(c, 0.99)").as("p99"))
        agg.crossJoin(broadcast(top)).select(
          col("n_keys"), col("tot").as("n_rows"),
          Num.rnd(col("mx").cast("double") / col("tot").cast("double"), 6)
            .as("max_share"),
          Num.rnd(col("p50"), 6).as("p50"), Num.rnd(col("p99"), 6).as("p99"),
          Num.rnd(sqrt((col("ss").cast("double")
              - col("tot").cast("double") * col("tot").cast("double")
                / col("n_keys").cast("double")) / col("n_keys").cast("double"))
            / (col("tot").cast("double") / col("n_keys").cast("double")), 6)
            .as("cv"),
          col("top_key"), col("top_n"))
      },
      Some("""WITH c AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
              FROM lineitem GROUP BY 1),
          top AS (SELECT l_partkey AS top_key, c AS top_n FROM c
            ORDER BY c DESC, l_partkey LIMIT 1),
          agg AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(c) AS BIGINT) AS tot, max(c) AS mx,
              CAST(sum(c * c) AS BIGINT) AS ss,
              quantile_cont(c, 0.5) AS p50, quantile_cont(c, 0.99) AS p99
            FROM c)
          SELECT n_keys, tot AS n_rows,
            round(CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE) * 1e6) / 1e6 AS max_share,
            round(p50 * 1e6) / 1e6 AS p50, round(p99 * 1e6) / 1e6 AS p99,
            round(sqrt((CAST(ss AS DOUBLE)
                - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE) / CAST(n_keys AS DOUBLE))
              / CAST(n_keys AS DOUBLE))
              / (CAST(tot AS DOUBLE) / CAST(n_keys AS DOUBLE)) * 1e6) / 1e6 AS cv,
            top.top_key, top.top_n
          FROM agg, top""")),

    // Deterministic per-group reservoir sample: exactly k=5 documents
    // per source, ranked by a salted md5 of the key — uniform,
    // repartition-stable, and bounded via GroupTopK partial heaps
    // (never a per-group sort).  The hash-rank trick is the
    // distributed replacement for sequential reservoir sampling.
    "q337_reservoir_sample" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            md5(concat(lit("rs:"), col("doc_id"))).as("h"))
        graft.plans.GroupTopK.topKPerKey(
          docs, Seq("source"), Seq(("h", false), ("doc_id", false)), 5)
          .select(col("source"), col("doc_id"))
      },
      Some("""SELECT source, doc_id FROM documents
          QUALIFY row_number() OVER (PARTITION BY source
            ORDER BY md5('rs:' || CAST(doc_id AS VARCHAR)), doc_id) <= 5""")),

    // IQR outlier profile over the lineitem numeric columns (the
    // column-quality report beside q241's profiling): long-form melt,
    // one exact-percentile pass per column group, then a broadcast
    // cut join counts the 1.5·IQR tails.
    "q338_iqr_outliers" -> QueryDef(
      (s, d) => {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val lf = Tables.lineitem(s, d).select(
          explode(array(cols.map(c =>
            struct(lit(c).as("colname"), Num.rnd(col(c), 6).as("v"))): _*)).as("e"))
          .select(col("e.colname").as("colname"), col("e.v").as("v"))
        val cuts = lf.groupBy("colname").agg(
          expr("percentile(v, 0.25)").as("q1"),
          expr("percentile(v, 0.75)").as("q3"))
        lf.join(broadcast(cuts), Seq("colname"))
          .groupBy("colname")
          .agg(
            Num.rnd(max(col("q1")), 6).as("q1"),
            Num.rnd(max(col("q3")), 6).as("q3"),
            sum(when(col("v") < col("q1") - lit(1.5) * (col("q3") - col("q1")),
              1L).otherwise(0L)).as("n_low"),
            sum(when(col("v") > col("q3") + lit(1.5) * (col("q3") - col("q1")),
              1L).otherwise(0L)).as("n_high"))
      },
      Some("""WITH lf AS (
            SELECT 'l_quantity' AS colname, round(l_quantity * 1e6) / 1e6 AS v
              FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', round(l_extendedprice * 1e6) / 1e6
              FROM lineitem
            UNION ALL
            SELECT 'l_discount', round(l_discount * 1e6) / 1e6 FROM lineitem),
          cuts AS (SELECT colname, quantile_cont(v, 0.25) AS q1,
              quantile_cont(v, 0.75) AS q3 FROM lf GROUP BY 1)
          SELECT lf.colname, round(max(c.q1) * 1e6) / 1e6 AS q1,
            round(max(c.q3) * 1e6) / 1e6 AS q3,
            CAST(sum(CASE WHEN v < c.q1 - 1.5 * (c.q3 - c.q1) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_low,
            CAST(sum(CASE WHEN v > c.q3 + 1.5 * (c.q3 - c.q1) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_high
          FROM lf JOIN cuts c ON lf.colname = c.colname GROUP BY 1"""))
  )
}
