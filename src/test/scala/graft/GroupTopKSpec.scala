package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.GroupTopK

class GroupTopKSpec extends SparkSpec {

  test("GroupTopKExec matches the window row_number formulation") {
    val orders = Tables.orders(spark, sf)
    val got = GroupTopK.topKPerKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val want = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("plan contains GroupTopKExec and clusters by the group key") {
    val orders = Tables.orders(spark, sf)
    val df = GroupTopK.topKPerKey(orders, Seq("o_custkey"),
      Seq(("o_orderkey", true)), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), plan)
    // map-side partial pass sits below the exchange, bounding the
    // shuffle to <= k rows per group per mapper
    assert(plan.contains("GroupTopKPartial"), plan)
    assert(plan.indexOf("GroupTopKPartial") > plan.indexOf("Exchange"), plan)
    // groups of size <= 2 everywhere
    val sizes = df.groupBy("o_custkey").count().agg(max("count")).head().getLong(0)
    assert(sizes <= 2)
  }

  test("k larger than group size returns whole groups") {
    val nation = Tables.nation(spark, sf)
    val got = GroupTopK.topKPerKey(nation, Seq("n_regionkey"),
      Seq(("n_nationkey", false)), 1000)
    assert(got.count() === nation.count())
  }
}
