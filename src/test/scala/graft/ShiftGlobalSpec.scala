package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ShiftGlobal

class ShiftGlobalSpec extends SparkSpec {
  import spark.implicits._

  test("shift matches single-partition lag across partition boundaries") {
    // enough rows to span all 4 test partitions after the range shuffle
    val df = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val got = ShiftGlobal.shift(df, Seq("o_orderkey"), "o_totalprice", 1, "prev")
    val want = df.withColumn("prev",
      lag(col("o_totalprice"), 1).over(Window.orderBy("o_orderkey")))
    assert(got.as("g").join(want.as("w"), Seq("o_orderkey"))
      .filter(!(col("g.prev") <=> col("w.prev"))).count() == 0)
  }

  test("negative periods = lead; diff and pct_change compose") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 25.0), (4L, 5.0))
      .toDF("k", "v")
    val lead2 = ShiftGlobal.shift(df, Seq("k"), "v", -2, "nxt")
      .orderBy("k").select("nxt").collect().map(r =>
        if (r.isNullAt(0)) null else r.getDouble(0))
    assert(lead2.toSeq == Seq(25.0, 5.0, null, null))
    val d = ShiftGlobal.diff(df, Seq("k"), "v", 1, "d")
      .orderBy("k").select("d").collect().map(r =>
        if (r.isNullAt(0)) null else r.getDouble(0))
    assert(d.toSeq == Seq(null, 10.0, 5.0, -20.0))
    val p = ShiftGlobal.pctChange(df, Seq("k"), "v", 1, "p")
      .orderBy("k").select("p").collect().map(r =>
        if (r.isNullAt(0)) null else r.getDouble(0))
    assert(p.toSeq == Seq(null, 1.0, 0.25, -0.8))
  }

  test("period beyond frame length yields all nulls") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val r = ShiftGlobal.shift(df, Seq("k"), "v", 5, "s")
    assert(r.filter(col("s").isNotNull).count() == 0)
  }
}
