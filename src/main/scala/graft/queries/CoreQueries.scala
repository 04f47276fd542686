package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators._
import graft.functions.Num

/** Relational core: aggregation, joins, sorts, set ops.
  * Each query exercises one SURVEY §2 operator through the graft operator
  * modules and carries a DuckDB oracle. Float aggregates are rounded in
  * BOTH engines so hash comparison is exact; integral aggregates are cast
  * to BIGINT on both sides (DuckDB sums integers into HUGEINT).
  */
object CoreQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // §2.4 groupby sum/count — the reference's flagship agg shape
    // (frontend/groupby.py:88-140).
    "q01_agg_sum" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(Num.sumMoney(col("l_quantity")).as("sum_qty"),
          Num.sumMoney(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, l_linestatus,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price,
             CAST(count(*) AS BIGINT) AS n
             FROM lineitem GROUP BY l_returnflag, l_linestatus"""),
      headline = true),

    // §2.4 mean/var/std/min/max (ddof=1 ⇔ var_samp/stddev_samp).
    "q02_agg_stats" -> QueryDef(
      (s, d) => GroupAgg.agg(Tables.lineitem(s, d), Seq("l_returnflag"),
          Seq("l_quantity" -> Seq("mean", "var", "std", "min", "max")))
        .select(col("l_returnflag"),
          Num.rnd(col("l_quantity_mean"), 6).as("mean_qty"),
          Num.rnd(col("l_quantity_var"), 6).as("var_qty"),
          Num.rnd(col("l_quantity_std"), 6).as("std_qty"),
          col("l_quantity_min").as("min_qty"),
          col("l_quantity_max").as("max_qty")),
      Some("""SELECT l_returnflag,
             round(avg(l_quantity), 6) AS mean_qty,
             round(var_samp(l_quantity), 6) AS var_qty,
             round(stddev_samp(l_quantity), 6) AS std_qty,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty
             FROM lineitem GROUP BY l_returnflag""")),

    // §2.4 any/all over booleans (AggCode ANY/ALL, config.py:179-191).
    "q03_agg_anyall" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .withColumn("big", col("o_totalprice") > 200000)
        .withColumn("pos", col("o_totalprice") > 1000)
        .groupBy("o_orderstatus")
        .agg(bool_or(col("big")).as("any_big"), bool_and(col("pos")).as("all_pos")),
      Some("""SELECT o_orderstatus,
             bool_or(o_totalprice > 200000) AS any_big,
             bool_and(o_totalprice > 1000) AS all_pos
             FROM orders GROUP BY o_orderstatus""")),

    // §2.4 prod — custom Aggregator (no Spark builtin).
    "q04_agg_prod" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .withColumn("f", lit(1.0) + col("l_discount"))
        .groupBy("l_orderkey")
        .agg(graft.functions.ProdAgg.prod(col("f")).as("p"))
        .select(col("l_orderkey"), Num.rnd(col("p"), 6).as("prod_f")),
      Some("""SELECT l_orderkey, round(product(1.0 + l_discount), 6) AS prod_f
             FROM lineitem GROUP BY l_orderkey""")),

    // §2.4 global reduction → one row (frontend/frame.py:340-594).
    "q05_global_reduce" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .agg(Num.sumMoney(col("l_quantity")).as("sum_qty"),
          Num.rnd(max(col("l_extendedprice")), 2).as("max_price"),
          count(col("l_orderkey")).as("n"),
          min(col("l_discount")).as("min_disc")),
      Some("""SELECT CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
             round(max(l_extendedprice), 2) AS max_price,
             CAST(count(l_orderkey) AS BIGINT) AS n,
             min(l_discount) AS min_disc
             FROM lineitem""")),

    // §2.3 inner equi-join (core/merge.py partitioned-hash path).
    "q06_join_inner" -> QueryDef(
      (s, d) => Joins.mergeOn(Tables.lineitem(s, d), Tables.orders(s, d),
          Seq("l_orderkey"), Seq("o_orderkey"), "inner")
        .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
          Num.rnd(col("l_extendedprice"), 2).as("price")),
      Some("""SELECT l_orderkey, l_linenumber, o_custkey,
             round(l_extendedprice, 2) AS price
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""),
      headline = true),

    // §2.3 left join with null-producing misses.
    "q07_join_left" -> QueryDef(
      (s, d) => Joins.mergeOn(Tables.orders(s, d),
          Tables.customer(s, d).filter(col("c_acctbal") > 5000)
            .select("c_custkey", "c_name", "c_acctbal"),
          Seq("o_custkey"), Seq("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          Num.rnd(col("c_acctbal"), 2).as("bal")),
      Some("""SELECT o_orderkey, o_custkey, c_name, round(c_acctbal, 2) AS bal
             FROM orders LEFT JOIN
             (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000) c
             ON o_custkey = c_custkey""")),

    // §2.3 full outer join with coalesced keys
    // (src/merge/merge.cu:148-151 replace_nulls).
    "q08_join_outer" -> QueryDef(
      (s, d) => Joins.mergeOn(
          Tables.orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n_orders")),
          Tables.customer(s, d).select("c_custkey", "c_name"),
          Seq("o_custkey"), Seq("c_custkey"), "outer")
        .select(col("o_custkey").as("custkey"), col("n_orders"), col("c_name")),
      Some("""SELECT COALESCE(o.o_custkey, c.c_custkey) AS custkey, n_orders, c_name
             FROM (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
                   FROM orders GROUP BY o_custkey) o
             FULL JOIN (SELECT c_custkey, c_name FROM customer) c
             ON o.o_custkey = c.c_custkey""")),

    // §2.3 right join (reference callers swap; free in Spark).
    "q09_join_right" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey")),
      Some("""SELECT c_custkey, c_name, o_orderkey
             FROM orders RIGHT JOIN customer ON o_custkey = c_custkey""")),

    // semi join (beyond reference; EXISTS).
    "q10_join_semi" -> QueryDef(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer WHERE EXISTS
             (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 100000)""")),

    // anti join (beyond reference; NOT EXISTS).
    "q11_join_anti" -> QueryDef(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS
             (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 100000)""")),

    // §2.3 broadcast star join: fact ⋈ three broadcast dims
    // (reference broadcast variant core/merge.py:85-93). At 100 TB the
    // dims stay broadcast; only the fact scan scales.
    "q12_star_broadcast" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(Num.sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT r_name, n_name,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
             CAST(count(*) AS BIGINT) AS n
             FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY r_name, n_name"""),
      headline = true),

    // §2.6 sort_values with explicit direction + null placement; rank
    // attached so sortedness itself is verified (driver compares
    // order-insensitively).
    "q13_sort_values" -> QueryDef(
      (s, d) => {
        // rank via the distributed two-phase row number — a naive
        // Window.orderBy(...) with no partitionBy funnels the whole
        // table through one partition.
        val sorted = Sorts.sortValues(Tables.customer(s, d),
          Seq("c_acctbal", "c_custkey"), Seq(false, true))
        graft.operators.Cumulative.globalRowNumberBy(sorted,
            Seq(Sorts.sortCol("c_acctbal", ascending = false),
              Sorts.sortCol("c_custkey", ascending = true)), "rn")
          .select(col("c_custkey"), Num.rnd(col("c_acctbal"), 2).as("bal"), col("rn"))
      },
      Some("""SELECT c_custkey, round(c_acctbal, 2) AS bal,
             CAST(row_number() OVER (ORDER BY c_acctbal DESC NULLS LAST,
                                     c_custkey ASC NULLS LAST) AS BIGINT) AS rn
             FROM customer""")),

    // §2.6 top-k → TakeOrderedAndProject (no global sort at scale).
    "q14_topk" -> QueryDef(
      (s, d) => Sorts.topK(Tables.orders(s, d), Seq("o_totalprice", "o_orderkey"),
          Seq(false, true), 15)
        .select(col("o_orderkey"), Num.rnd(col("o_totalprice"), 2).as("price")),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
             ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC LIMIT 15"""),
      headline = true),

    // §2.2 head over explicit order (SLICE_BY_RANGE analogue).
    "q16_head" -> QueryDef(
      (s, d) => Projections.headBy(Tables.lineitem(s, d),
          Seq(col("l_orderkey"), col("l_linenumber")), 20)
        .select("l_orderkey", "l_linenumber", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
             ORDER BY l_orderkey, l_linenumber LIMIT 20""")),

    // §2.7 concat(axis=0) = union semantics (README.md:194-196).
    "q18_concat_union" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        SetOps.concatRows(Seq(
          li.filter(col("l_returnflag") === "A")
            .select(col("l_orderkey"), col("l_linenumber"), lit("a").as("src")),
          li.filter(col("l_returnflag") === "R")
            .select(col("l_orderkey"), col("l_linenumber"), lit("r").as("src"))))
      },
      Some("""SELECT l_orderkey, l_linenumber, 'a' AS src FROM lineitem WHERE l_returnflag = 'A'
             UNION ALL
             SELECT l_orderkey, l_linenumber, 'r' AS src FROM lineitem WHERE l_returnflag = 'R'""")),

    // §2.7 drop_duplicates(subset) keep-any → DISTINCT.
    "q19_dedup_distinct" -> QueryDef(
      (s, d) => SetOps.dropDuplicates(
          Tables.orders(s, d).select("o_custkey", "o_orderstatus"),
          Seq("o_custkey", "o_orderstatus")),
      Some("SELECT DISTINCT o_custkey, o_orderstatus FROM orders")),

    // §2.7 drop_duplicates keep=first with deterministic order.
    "q20_dedup_keepfirst" -> QueryDef(
      (s, d) => SetOps.dropDuplicatesKeep(Tables.orders(s, d), Seq("o_custkey"),
          Seq("o_orderdate", "o_orderkey"), keepFirst = true)
        .select(col("o_custkey"), col("o_orderkey")),
      Some("""SELECT o_custkey, o_orderkey FROM
             (SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS rn
              FROM orders) WHERE rn = 1""")),

    // §2.7 drop_duplicates keep=False — drop every duplicated row.
    "q20b_dedup_keepnone" -> QueryDef(
      (s, d) => SetOps.dropDuplicatesKeepNone(
          Tables.orders(s, d).select("o_custkey", "o_orderstatus"),
          Seq("o_custkey")),
      Some("""SELECT o_custkey, o_orderstatus FROM orders
             QUALIFY count(*) OVER (PARTITION BY o_custkey) = 1""")),

    // §2.7 set intersection / difference (beyond reference).
    "q21_intersect" -> QueryDef(
      (s, d) => SetOps.intersect(
          Tables.orders(s, d).filter(col("o_totalprice") > 50000).select("o_custkey"),
          Tables.orders(s, d).filter(col("o_orderstatus") === "F").select("o_custkey")),
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 50000
             INTERSECT
             SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""")),

    "q22_except" -> QueryDef(
      (s, d) => SetOps.except(
          Tables.customer(s, d).select("c_custkey"),
          Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))),
      Some("""SELECT c_custkey FROM customer
             EXCEPT
             SELECT o_custkey AS c_custkey FROM orders"""))
  )
}
