package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.Num

/** q87 shape experiment at the staged sf10 tier: current
  * rollup-then-join vs direct-join-to-tiny-group (n_orders computed
  * from ORDERS alone — (seg, ym) is a function of the order, so the
  * distinct-count never needs lineitem).
  */
object ProbeQ87 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/target/tmp/sf100x")
    val spark = GraftSession.builder(master = "local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def current(): DataFrame =
      graft.SparkEntry.queries("q87_etl_pipeline")(spark, d)

    def direct(): DataFrame = {
      val ordSeg = Tables.orders(spark, d)
        .join(broadcast(Tables.customer(spark, d)),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"))
      val lines = Tables.lineitem(spark, d)
        .select(col("l_orderkey"),
          (Num.cents(col("l_extendedprice")) *
            (lit(100L) - Num.cents(col("l_discount")))).as("__rev_u"),
          Num.cents(col("l_quantity")).as("__qty_c"),
          col("l_quantity").isNotNull.cast("long").as("__qty_n"))
      val lineAgg = lines
        .join(ordSeg.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_mktsegment", "ym")
        .agg(round(graft.functions.Int128Sum(col("__rev_u"), 4), 2)
            .cast("double").as("revenue"),
          Num.rnd(graft.functions.Int128Sum(col("__qty_c"), 2).cast("double")
            / sum(col("__qty_n")), 6).as("avg_qty"),
          count(lit(1)).as("n_lines"))
      val ordAgg = ordSeg
        // only orders with lineitem rows count (inner-join semantics)
        .join(Tables.lineitem(spark, d).select(col("l_orderkey")).distinct(),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("c_mktsegment", "ym")
        .agg(count(lit(1)).as("n_orders"))
      lineAgg.join(ordAgg, Seq("c_mktsegment", "ym"))
        .select(col("c_mktsegment"), col("ym"), col("revenue"),
          col("avg_qty"), col("n_orders"), col("n_lines"))
    }

    def time(tag: String, f: () => DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("current", current)
    time("direct", direct)
    // value parity
    val a = current().orderBy("c_mktsegment", "ym").collect().map(_.toString)
    val b = direct().select("c_mktsegment", "ym", "revenue", "avg_qty",
      "n_orders", "n_lines").orderBy("c_mktsegment", "ym").collect().map(_.toString)
    println(s"parity: ${a.sameElements(b)}")
    spark.stop()
  }
}
