package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.api.GFrame
import graft.functions.Num

/** End-to-end pipelines written against the pandas-flavored GFrame API —
  * proving the user surface composes (the mortgage-benchmark shape:
  * scan → query → groupby-agg → merge → sort, reference
  * `benchmarks/mortgage/mortgage.py:448-510`).
  */
object ApiQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    "q70_gframe_pipeline" -> QueryDef(
      (s, d) => {
        val li = GFrame(Tables.lineitem(s, d))
        val orders = GFrame(Tables.orders(s, d))
        li.query("l_quantity > @qmin & l_discount < 0.06", Map("qmin" -> 10))
          .groupby("l_orderkey")
          .agg("l_extendedprice" -> Seq("sum"), "l_quantity" -> Seq("mean", "count"))
          .mergeOn(orders, Seq("l_orderkey"), Seq("o_orderkey"), "inner")
          .apply(col("o_orderstatus").isNotNull) // boolean-mask filter
          .sortValues(Seq("l_extendedprice_sum", "l_orderkey"), Seq(false, true))
          .head(50)
          .df.select(col("l_orderkey"),
            Num.rnd(col("l_extendedprice_sum"), 2).as("rev"),
            Num.rnd(col("l_quantity_mean"), 6).as("avg_qty"),
            col("l_quantity_count").as("n"),
            col("o_orderstatus"))
      },
      Some("""SELECT l_orderkey, round(sum(l_extendedprice), 2) AS rev,
             round(avg(l_quantity), 6) AS avg_qty,
             CAST(count(l_quantity) AS BIGINT) AS n,
             any_value(o_orderstatus) AS o_orderstatus
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE l_quantity > 10 AND l_discount < 0.06
             GROUP BY l_orderkey
             ORDER BY sum(l_extendedprice) DESC NULLS LAST, l_orderkey ASC
             LIMIT 50"""),
      headline = true),

    "q71_gframe_nulls" -> QueryDef(
      (s, d) => {
        val orders = GFrame(Tables.orders(s, d))
        val cust = GFrame(Tables.customer(s, d)
          .filter(col("c_acctbal") > 5000).select("c_custkey", "c_name", "c_acctbal"))
        orders
          .mergeOn(cust, Seq("o_custkey"), Seq("c_custkey"), "left")
          .fillna("none", Seq("c_name"))
          .dropna(subset = Seq("c_acctbal"))
          .setIndex("o_orderkey")
          .sortIndex()
          .head(100)
          .df.select(col("o_orderkey"), col("c_name"),
            Num.rnd(col("c_acctbal"), 2).as("bal"))
      },
      Some("""SELECT o_orderkey, c_name, round(c_acctbal, 2) AS bal
             FROM orders JOIN
             (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000) c
             ON o_custkey = c_custkey
             WHERE c_acctbal IS NOT NULL
             ORDER BY o_orderkey LIMIT 100"""))
  )
}
