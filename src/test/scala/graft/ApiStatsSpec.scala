package graft

import org.apache.spark.sql.functions._

import graft.api.GFrame

/** GFrame wrappers for the Stats/Triangles/reservoir operators
  * delegate to the same implementations the gate queries use.
  */
class ApiStatsSpec extends SparkSpec {

  test("welchTTest / anovaF wrappers equal the gate queries") {
    val ev = GFrame(Tables.events(spark, sf))
    val w = ev.welchTTest("event_type", "value", "purchase", "view").df.collect()(0)
    val q = SparkEntry.queries("q323_welch_ttest")(spark, sf).collect()(0)
    assert(w.toSeq == q.toSeq)
    val a = ev.anovaF("event_type", "value").df.collect()(0)
    val qa = SparkEntry.queries("q324_anova_f")(spark, sf).collect()(0)
    assert(a.toSeq == qa.toSeq)
  }

  test("triangleCount wrapper normalizes reversed and duplicate edges") {
    import spark.implicits._
    // K3 written with reversed duplicates
    val e = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L)).toDF("u", "v")
    val r = GFrame(e).triangleCount("u", "v").df.collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 && r.getLong(2) == 1)
  }

  test("reservoirSample wrapper keeps min(k, group size) rows and all columns") {
    val g = GFrame(Tables.documents(spark, sf))
      .reservoirSample("source", "doc_id", 3).df
    assert(g.columns.toSet == Tables.documents(spark, sf).columns.toSet)
    val sizes = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = g.groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for ((src, n) <- sizes) assert(got(src) == math.min(3L, n))
  }

  test("holtSmooth / cusumChangepoint wrappers run on a prepared series") {
    import graft.functions.Num
    val daily = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        Num.rnd(col("value"), 6).cast("decimal(18,6)").as("vr"))
      .groupBy("event_type", "day")
      .agg(sum(col("vr")).cast("decimal(18,6)").as("x"))
    val cp = GFrame(daily).cusumChangepoint("event_type", "day", "x").df.collect()
    val qcp = SparkEntry.queries("q325_cusum_changepoint")(spark, sf).collect()
    assert(cp.map(_.toSeq).toSet == qcp.map(_.toSeq).toSet)
    val hs = GFrame(daily
        .select(col("event_type"), col("day"), col("x").cast("double").as("xd")))
      .holtSmooth("event_type", "day", "xd").df.collect()
    assert(hs.length == qcp.length) // one row per event type
  }
}
