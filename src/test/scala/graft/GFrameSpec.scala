package graft

import org.apache.spark.sql.functions._
import graft.api.GFrame

class GFrameSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = GFrame(Tables.lineitem(spark, sf))
  private lazy val orders = GFrame(Tables.orders(spark, sf))

  test("projection, mask filter and query compose") {
    val out = li("l_orderkey", "l_quantity")
      .apply(col("l_quantity") > 30)
      .query("l_quantity <= @hi", Map("hi" -> 40))
    assert(out.df.columns.toSeq === Seq("l_orderkey", "l_quantity"))
    val qs = out.df.select(min("l_quantity"), max("l_quantity")).head()
    assert(qs.getDouble(0) > 30 && qs.getDouble(1) <= 40)
  }

  test("groupby agg names columns pandas-style") {
    val g = li.groupby("l_returnflag").agg(
      "l_quantity" -> Seq("sum", "mean"), "l_extendedprice" -> Seq("max"))
    assert(g.df.columns.toSet ===
      Set("l_returnflag", "l_quantity_sum", "l_quantity_mean", "l_extendedprice_max"))
  }

  test("merge + sort + head pipeline matches direct Spark result") {
    val got = li.groupby("l_orderkey").sum("l_extendedprice")
      .mergeOn(orders, Seq("l_orderkey"), Seq("o_orderkey"), "inner")
      .sortValues(Seq("l_extendedprice_sum", "l_orderkey"), Seq(false, true))
      .head(5).df.select("l_orderkey").collect().map(_.getLong(0)).toSeq
    val want = Tables.lineitem(spark, sf).groupBy("l_orderkey")
      .agg(sum("l_extendedprice").as("s"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .orderBy(col("s").desc, col("l_orderkey"))
      .limit(5).select("l_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got === want)
  }

  test("setIndex/loc/locRange") {
    val byKey = orders.setIndex("o_orderkey")
    assert(byKey.loc(100L).df.count() <= 1)
    val r = byKey.locRange(100L, 200L).df
      .select(min("o_orderkey"), max("o_orderkey")).head()
    assert(r.getLong(0) >= 100L && r.getLong(1) <= 200L)
  }

  test("fillna/dropna/isna on join-produced nulls") {
    val j = orders.mergeOn(
      GFrame(Tables.customer(spark, sf).filter(col("c_acctbal") > 5000)
        .select("c_custkey", "c_name")),
      Seq("o_custkey"), Seq("c_custkey"), "left")
    val nNull = j.df.filter(col("c_name").isNull).count()
    assert(nNull > 0)
    assert(j.fillna("x", Seq("c_name")).df.filter(col("c_name").isNull).count() === 0)
    assert(j.dropna(subset = Seq("c_name")).df.count() === j.df.count() - nNull)
  }

  test("concat is union semantics") {
    val a = li.query("l_returnflag == 'A'")
    val r = li.query("l_returnflag == 'R'")
    assert(GFrame.concat(Seq(a, r)).df.count() === a.df.count() + r.df.count())
  }

  test("astype casts") {
    val out = li("l_quantity").astype("l_quantity" -> "int32")
    assert(out.df.schema("l_quantity").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("dropDuplicatesKeep with index determinism") {
    val d = orders.setIndex("o_orderkey")
      .dropDuplicatesKeep(Seq("o_custkey"), keepFirst = true)
    val n = d.df.groupBy("o_custkey").count().filter(col("count") > 1).count()
    assert(n === 0)
  }
}
