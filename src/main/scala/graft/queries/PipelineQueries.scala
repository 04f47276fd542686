package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.{Num, PandasArith}

/** E2E ETL pipeline (the reference's mortgage-benchmark shape), vector
  * aggregation, NaN semantics, full datetime parsing.
  */
object PipelineQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // mortgage-style E2E: fact⋈fact⋈dim joins + feature engineering +
    // multi-agg + distinct count (reference
    // benchmarks/mortgage/mortgage.py:448-510 pipeline shape).
    "q87_etl_pipeline" -> QueryDef(
      (s, d) => {
        // countDistinct would EXPAND every joined row in two copies
        // through the aggregate; and since (c_mktsegment, ym) are
        // functions of the order, the per-order rollup doesn't need the
        // join at all: aggregate lineitem BY l_orderkey FIRST (the
        // fact table collapses ~4x before anything joins; partial agg
        // runs map-side), then join the per-order rows to orders —
        // which REUSES the aggregation's hash partitioning on the join
        // key, so only the orders side shuffles — and broadcast
        // customer. n_orders becomes a plain count. Long integer
        // partials stay exact: per-order sums are bounded (≤ 7 lines ×
        // 1e7 cents), the unbounded second stage uses the int128
        // kernel. Aggregate-before-join is also the 100 TB shape: the
        // join input shrinks from line-level to order-level.
        // (r13 measured and REJECTED: Tables.fanout before this rollup —
        // the full-row repartition write on the serial scan task cost
        // more than the parallelism it bought: 1.28 -> 1.47 s solo.)
        Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum(Num.cents(col("l_extendedprice")) * (lit(100L) - Num.cents(col("l_discount")))).as("__rev_u"),
            sum(Num.cents(col("l_quantity"))).as("__qty_c"),
            count(col("l_quantity")).as("__qty_n"),
            count(lit(1)).as("__n"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .withColumn("ym", year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .groupBy("c_mktsegment", "ym")
          .agg(round(graft.functions.Int128Sum(col("__rev_u"), 4), 2).cast("double").as("revenue"),
            Num.rnd(graft.functions.Int128Sum(col("__qty_c"), 2).cast("double") / sum(col("__qty_n")), 6).as("avg_qty"),
            count(lit(1)).as("n_orders"),
            sum(col("__n")).as("n_lines"))
      },
      Some("""SELECT c_mktsegment,
             CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS ym,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(l_quantity) * 1e6) / 1e6 AS avg_qty,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
             CAST(count(*) AS BIGINT) AS n_lines
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             GROUP BY 1, 2"""),
      headline = true),

    // element-wise vector aggregation: per-label embedding centroid
    // (long format: label, dim, mean) — posexplode + hash agg, the
    // scalable shape for 10^9 vectors (shuffle carries (label, dim)
    // partial sums, never whole vectors).
    // r10: per-label centroids via the native VecSumExpr aggregate
    // (64-lane primitive buffer, map-side combine, no encoder boxing)
    // instead of posexplode — n·64 exploded rows through the hash agg
    // become n fused array adds, and the exchange carries one 64-array
    // per (label × partition). Same addend set, same 6dp rounding;
    // 10×-tier bench table in BASELINE.md. VecSumAgg is the udaf
    // differential twin (VecSumSpec pins ≡).
    "q88_embed_centroid" -> QueryDef(
      (s, d) => Tables.embeddings(s, d)
        .groupBy("label")
        .agg(graft.functions.VecSumExpr(64)(col("embedding")).as("sc"))
        // a group whose embeddings are all null/mis-sized has sc.n = 0;
        // the oracle (and the old posexplode form) emit no rows for it,
        // so gate the transform on n > 0 instead of emitting 64 NaNs
        .filter(col("sc")("n") > 0)
        .select(col("label"),
          posexplode(expr("transform(sc.sums, x -> x / sc.n)"))
            .as(Seq("pos", "m")))
        .select(col("label"), (col("pos") + 1).as("dim"),
          Num.rnd(col("m"), 6).as("mean_v")),
      Some("""SELECT label, CAST(dim AS INTEGER) AS dim, round(avg(v), 6) AS mean_v
             FROM (SELECT label, unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS dim
                   FROM embeddings)
             GROUP BY 1, 2"""),
      headline = true),

    // NaN vs null (SURVEY §7.4): pandas' float sentinel is NaN; isna
    // must catch both, fillna must repair both.
    "q89_nan_semantics" -> QueryDef(
      (s, d) => {
        val withNan = Tables.lineitem(s, d)
          .withColumn("x", when(col("l_returnflag") === "A", lit(Double.NaN))
            .when(col("l_returnflag") === "R", lit(null))
            .otherwise(col("l_quantity")))
        withNan.select(
          col("l_orderkey"), col("l_linenumber"),
          PandasArith.isna(col("x")).as("is_missing"),
          Num.rnd(when(PandasArith.isna(col("x")), lit(-1.0)).otherwise(col("x")), 2)
            .as("filled"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             (x IS NULL OR isnan(x)) AS is_missing,
             round(CASE WHEN x IS NULL OR isnan(x) THEN -1.0 ELSE x END, 2) AS filled
             FROM (SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_returnflag = 'A' THEN 'nan'::DOUBLE
                        WHEN l_returnflag = 'R' THEN NULL
                        ELSE l_quantity END AS x
                   FROM lineitem)""")),

    // to_datetime with full %H %M %S directives
    // (src/string/tasks/to_datetime.cc supported set).
    "q90_to_datetime_time" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .withColumn("str", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .select(col("event_id"),
          graft.functions.StringOps.toDatetime(col("str"), "%Y-%m-%d %H:%M:%S").as("parsed"))
        .select(col("event_id"),
          hour(col("parsed")).as("h"), minute(col("parsed")).as("mi"),
          second(col("parsed")).as("sec"), col("parsed").cast("date").as("dt")),
      Some("""SELECT event_id,
             CAST(hour(p) AS INTEGER) AS h,
             CAST(minute(p) AS INTEGER) AS mi,
             CAST(EXTRACT(second FROM p) AS INTEGER) AS sec,
             CAST(p AS DATE) AS dt
             FROM (SELECT event_id,
                   strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS p
                   FROM events)"""))
  )
}
