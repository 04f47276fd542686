package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Num
import graft.operators.AsOfJoin

/** Beyond-parity relational surface: categorical encoding, distinct
  * aggregates, rollup, ranking/analytic windows, pivot/melt, as-of join,
  * concat(axis=1), frame equality.
  */
object ExtraQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // §2.8 astype("category"): deterministic dictionary (sorted distinct)
    // + integer codes (reference builds the dict via dedup tree,
    // core/column.py:1134-1249; we keep values as strings and expose
    // .cat.codes as dense_rank over the sorted dictionary).
    "q72_cat_codes" -> QueryDef(
      (s, d) => {
        // dictionary discovery is a bounded distinct (cardinality ≪ rows,
        // the getDummies pattern); codes are then a scan-stage literal-map
        // lookup — no global dense_rank window funneling the table
        // through one partition.
        val df = Tables.orders(s, d)
        val dt = graft.operators.Categorical.infer(df, "o_orderpriority")
        df.select(col("o_orderkey"), col("o_orderpriority"),
          dt.codes(col("o_orderpriority")).as("code"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             CAST(dense_rank() OVER (ORDER BY o_orderpriority) - 1 AS INTEGER) AS code
             FROM orders""")),

    // exact + distinct aggregation (beyond reference).
    "q73_distinct_agg" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             CAST(count(*) AS BIGINT) AS n
             FROM lineitem GROUP BY 1""")),

    // rollup with grouping-null markers (beyond reference; Catalyst
    // plans a single expand + aggregate).
    "q74_rollup" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(Num.rnd(sum(col("l_quantity")), 2).as("qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("__all__")).as("rf"),
          coalesce(col("l_linestatus"), lit("__all__")).as("ls"),
          col("qty"), col("n")),
      Some("""SELECT COALESCE(l_returnflag, '__all__') AS rf,
             COALESCE(l_linestatus, '__all__') AS ls,
             round(sum(l_quantity), 2) AS qty,
             CAST(count(*) AS BIGINT) AS n
             FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // ranking + analytic windows (beyond reference: rank/dense_rank/
    // lag/lead/ntile over partitioned keys — one hash shuffle).
    "q75_window_funcs" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          ntile(4).over(w).cast("long").as("quartile"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             CAST(rank() OVER w AS BIGINT) AS rk,
             CAST(dense_rank() OVER w AS BIGINT) AS drk,
             lag(o_orderkey, 1) OVER w AS prev_order,
             lead(o_orderkey, 1) OVER w AS next_order,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile
             FROM orders
             WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // pivot (wide aggregation) — fixed category list so the plan is a
    // single pass, no driver-side distinct.
    "q76_pivot" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(Num.rnd(sum(col("l_quantity")), 2))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0.0)).as("qty_f"),
          coalesce(col("O"), lit(0.0)).as("qty_o")),
      Some("""SELECT l_returnflag,
             COALESCE(round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2), 0.0) AS qty_f,
             COALESCE(round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2), 0.0) AS qty_o
             FROM lineitem GROUP BY l_returnflag""")),

    // melt/unpivot (long format) — narrow transform, no shuffle.
    "q77_melt" -> QueryDef(
      (s, d) => Tables.supplier(s, d)
        .unpivot(Array(col("s_suppkey")),
          Array(col("s_acctbal"), col("s_nationkey").cast("double")),
          "metric", "value")
        .select(col("s_suppkey"), col("metric"), Num.rnd(col("value"), 2).as("value")),
      Some("""SELECT s_suppkey, 's_acctbal' AS metric, round(s_acctbal, 2) AS value FROM supplier
             UNION ALL
             SELECT s_suppkey, 's_nationkey' AS metric,
                    round(CAST(s_nationkey AS DOUBLE), 2) AS value FROM supplier""")),

    // as-of join: each event picks up the most recent hourly summary
    // (per event_type) at or before its timestamp — verified against
    // DuckDB's native ASOF JOIN.
    "q78_asof_join" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
        val summaries = Tables.events(s, d)
          .groupBy(col("event_type"),
            unix_micros(date_trunc("hour", col("ts"))).as("hus"))
          .agg(count(lit(1)).as("hourly_n"))
        AsOfJoin.backward(ev, summaries, "event_type", "tus", "hus", Seq("hourly_n"))
          .select(col("event_id"), col("event_type"), col("hourly_n"))
      },
      Some("""WITH ev AS (SELECT event_id, event_type, epoch_us(ts) AS tus FROM events),
             summaries AS (SELECT event_type,
                             epoch_us(date_trunc('hour', ts)) AS hus,
                             CAST(count(*) AS BIGINT) AS hourly_n
                           FROM events GROUP BY 1, 2)
             SELECT event_id, ev.event_type AS event_type, hourly_n
             FROM ev ASOF JOIN summaries
               ON ev.event_type = summaries.event_type AND ev.tus >= summaries.hus""")),

    // §2.7 concat(axis=1): column-wise juxtaposition via index join
    // (reference requires aligned indexes, core/table.py:366-378).
    "q79_concat_axis1" -> QueryDef(
      (s, d) => {
        val a = Tables.orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        val b = Tables.orders(s, d).groupBy("o_custkey")
          .agg(Num.rnd(sum(col("o_totalprice")), 2).as("total"))
        a.join(b, Seq("o_custkey"), "full_outer")
      },
      Some("""SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             round(sum(o_totalprice), 2) AS total
             FROM orders GROUP BY 1""")),

    // §2.3 suffix handling on overlapping columns through the gate:
    // same-customer order pairs via self-merge (suffixes _x/_y,
    // core/merge.py:536-558).
    "q100_merge_suffixes" -> QueryDef(
      (s, d) => {
        import graft.operators.Joins
        val o = Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice")
        Joins.merge(o, o, Seq("o_custkey"), "inner")
          .filter(col("o_orderkey_x") < col("o_orderkey_y"))
          .select(col("o_custkey"), col("o_orderkey_x"), col("o_orderkey_y"),
            Num.rnd(col("o_totalprice_x") + col("o_totalprice_y"), 2).as("combined"))
      },
      Some("""SELECT a.o_custkey, a.o_orderkey AS o_orderkey_x,
             b.o_orderkey AS o_orderkey_y,
             round(a.o_totalprice + b.o_totalprice, 2) AS combined
             FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
             WHERE a.o_orderkey < b.o_orderkey""")),

    // semi-structured extraction: JSON props column (get_json_object +
    // typed from_json) — a training-data staple.
    "q101_json_extract" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))
        ev.select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k_path"),
            from_json(col("props"), schema).getField("k").as("k_typed"))
          .groupBy("k_path")
          .agg(count(lit(1)).as("n"),
            sum(when(col("k_path") === col("k_typed"), 1L).otherwise(0L)).as("n_agree"))
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_agree
             FROM events GROUP BY 1""")),

    // custom whole-operator (LogicalPlan+Strategy+SparkPlan): group-wise
    // top-k via bounded heaps — no per-group sort (plans/GroupTopK).
    "q97_group_topk" -> QueryDef(
      (s, d) => graft.plans.GroupTopK.topKPerKey(
          Tables.orders(s, d), Seq("o_custkey"),
          Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
        .select(col("o_custkey"), col("o_orderkey"),
          Num.rnd(col("o_totalprice"), 2).as("price")),
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
             FROM orders
             QUALIFY row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3"""),
      headline = true),

    // §2.7 equals — distributed cell-wise frame equality → single bool
    // (reference EQUALS task src/reduction/tasks/equals.cc:158).
    "q80_frame_equals" -> QueryDef(
      (s, d) => {
        val a = Tables.nation(s, d)
        val b = Tables.nation(s, d).orderBy(col("n_name")) // same rows, any order
        val eq = a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
        val s2 = s
        import s2.implicits._
        Seq(eq).toDF("frames_equal")
      },
      Some("SELECT true AS frames_equal"))
  )
}
