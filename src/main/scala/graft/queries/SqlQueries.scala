package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Num

/** SQL-interface surface: the same ANSI SQL text runs verbatim on both
  * Spark and DuckDB (dialect-common subset incl. the scale/round/unscale
  * float formula), plus chained-merge coverage.
  */
object SqlQueries {

  /** One SQL string, two engines — the oracle IS the query. */
  private val identicalSql: String =
    """SELECT l_returnflag, l_linestatus,
      |CAST(count(*) AS BIGINT) AS n,
      |CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty,
      |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS rev
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q17, dialect-common: correlated count+sum subqueries restate
    * `l_quantity < 0.2 * avg(part's quantity)` as `5·q·cnt < sum` —
    * exact in DECIMAL space on both engines.
    */
  private val tpchQ17Sql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_rev
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#4' AND p.p_size < 15
      |  AND CAST(l.l_quantity AS DECIMAL(12,2)) * 5 *
      |      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
      |    < (SELECT sum(CAST(l2.l_quantity AS DECIMAL(12,2)))
      |       FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin

  /** TPC-H Q20 (adapted — no partsupp in this schema), dialect-common. */
  private val tpchQ20Sql: String =
    """SELECT s_suppkey, s_name,
      |CAST(round(CAST(s_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE) AS acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT a.l_suppkey FROM
      |    (SELECT l_suppkey, l_partkey,
      |       sum(CAST(l_quantity AS DECIMAL(12,2))) AS q97
      |     FROM lineitem
      |     WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |       AND l_shipdate < TIMESTAMP '1998-01-01'
      |     GROUP BY 1, 2) a
      |    JOIN (SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qt
      |          FROM lineitem GROUP BY 1) b
      |      ON a.l_partkey = b.l_partkey
      |  WHERE a.q97 * 12 > b.qt
      |    AND a.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'))""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(

    "q93_sql_interface" -> QueryDef(
      (s, d) => {
        Tables.names.foreach(t =>
          Tables.load(s, d, t).createOrReplaceTempView(t))
        s.sql(identicalSql)
      },
      Some(identicalSql)),

    // chained merges with mixed join types (reference df_merge chained
    // variants, tests/pandas/df_merge*.py).
    "q94_chained_merge" -> QueryDef(
      (s, d) => {
        import graft.operators.Joins
        val step1 = Joins.mergeOn(Tables.lineitem(s, d), Tables.orders(s, d),
          Seq("l_orderkey"), Seq("o_orderkey"), "inner")
        val step2 = Joins.mergeOn(step1,
          Tables.customer(s, d).filter(col("c_acctbal") > 3000),
          Seq("o_custkey"), Seq("c_custkey"), "left")
        val step3 = Joins.mergeOn(step2, Tables.nation(s, d),
          Seq("c_nationkey"), Seq("n_nationkey"), "left")
        step3.groupBy("n_name")
          .agg(count(lit(1)).as("n"),
            Num.sumMoney(col("l_extendedprice")).as("price"))
      },
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS price
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 3000) c
               ON o_custkey = c_custkey
             LEFT JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_name""")),

    // exact interpolated percentiles (beyond reference): Spark
    // percentile() and DuckDB quantile_cont share the linear
    // interpolation definition.
    "q95_percentiles" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          Num.rnd(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          Num.rnd(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
          Num.rnd(expr("percentile(l_extendedprice, 0.25)"), 6).as("price_p25")),
      Some("""SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.5) * 1e6) / 1e6 AS p50,
             round(quantile_cont(l_quantity, 0.9) * 1e6) / 1e6 AS p90,
             round(quantile_cont(l_extendedprice, 0.25) * 1e6) / 1e6 AS price_p25
             FROM lineitem GROUP BY l_returnflag""")),

    // TPC-H Q6 shape: date-range + predicate scan aggregation — the
    // filters (incl. the timestamp range) all push into the parquet scan.
    "q98_tpch_q6" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
        .agg(Num.sumPriceTimes(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
             CAST(count(*) AS BIGINT) AS n
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1994-01-01'
               AND l_shipdate < TIMESTAMP '1995-01-01'
               AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""")),

    // TPC-H Q3 shape: selective join + group + top-10 by revenue.
    "q99_tpch_q3" -> QueryDef(
      (s, d) => Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(Num.rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .select(col("l_orderkey"), col("o_orderdate").cast("date").as("odate"), col("revenue")),
      Some("""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate, revenue FROM (
             SELECT l_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             FROM customer
             JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON o_orderkey = l_orderkey
             WHERE c_mktsegment = 'BUILDING'
             GROUP BY l_orderkey, o_orderdate)
             ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""")),

    // TPC-H Q17 shape (correlated scalar subqueries): small-quantity
    // orders below 20% of the part's average quantity. The identical
    // SQL text runs on both engines; the 0.2·avg predicate is restated
    // exactly in DECIMAL/integer space (5·q·cnt < sum) so no double
    // division sits on a comparison boundary. Catalyst decorrelates
    // both subqueries into ONE per-part aggregate joined on p_partkey
    // (RewriteCorrelatedScalarSubquery; plan notes in PLANS.md) — no
    // per-row re-aggregation, no CartesianProduct, scale-safe.
    "q184_tpch_q17" -> QueryDef(
      (s, d) => {
        Seq("lineitem", "part").foreach(t =>
          Tables.load(s, d, t).createOrReplaceTempView(t))
        s.sql(tpchQ17Sql)
      },
      Some(tpchQ17Sql)),

    // TPC-H Q18 shape (semi-join on an aggregate): large-volume orders.
    // DataFrame form: the HAVING-subquery becomes an explicit
    // groupBy→filter→left_semi join — the aggregate side is tiny after
    // its filter, so AQE broadcasts the semi side; the fact table is
    // never shuffled for the membership test.
    "q185_tpch_q18" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val big = li.groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("q"))
          .filter(col("q") > 150).select("l_orderkey")
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
          .join(li.join(big, Seq("l_orderkey"), "left_semi"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate").cast("date").as("odate"))
          .agg(Num.rnd(sum(col("l_quantity").cast("decimal(12,2)")), 2).as("qty"))
      },
      Some("""SELECT c_name, c_custkey, o_orderkey,
             CAST(o_orderdate AS DATE) AS odate,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty
             FROM customer
             JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON o_orderkey = l_orderkey
             WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
               GROUP BY l_orderkey
               HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150)
             GROUP BY 1, 2, 3, 4""")),

    // TPC-H Q20 shape (nested semi-joins on aggregates), adapted to
    // this schema (no partsupp table): suppliers who shipped more than
    // 1/12 of a red part's all-time quantity during 1997. Both IN
    // subqueries plan as semi joins; the share predicate joins two
    // partial-aggregatable rollups of the same fact on l_partkey.
    "q186_tpch_q20" -> QueryDef(
      (s, d) => {
        Seq("lineitem", "part", "supplier").foreach(t =>
          Tables.load(s, d, t).createOrReplaceTempView(t))
        s.sql(tpchQ20Sql)
      },
      Some(tpchQ20Sql)),

    // regex extraction + split-index string ops (corpus feature
    // extraction staples).
    "q96_str_extract" -> QueryDef(
      (s, d) => Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        split(col("c_name"), "#").getItem(1).as("after_hash"),
        substring(col("c_mktsegment"), 1, 3).as("seg3")),
      Some("""SELECT c_custkey,
             regexp_extract(c_name, '([0-9]+)', 1) AS digits,
             string_split(c_name, '#')[2] AS after_hash,
             substr(c_mktsegment, 1, 3) AS seg3
             FROM customer"""))
  )
}
