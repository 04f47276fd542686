package graft

import org.apache.spark.sql.functions._
import graft.operators.Ewm

class EwmSpec extends SparkSpec {
  import spark.implicits._

  test("grouped ewm matches the driver-side recurrence") {
    val events = Tables.events(spark, sf).filter(col("user_id") < 20)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tus"), col("value"))
    val got = Ewm.ewmMean(events, Seq("user_id"), Seq("tus", "event_id"),
        "value", alpha = 0.3, "ewm")
      .select("event_id", "ewm").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent driver-side fold in the same order
    val rows = events.collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(0), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val expected = scala.collection.mutable.Map[Long, Double]()
    val state = scala.collection.mutable.Map[Long, Double]()
    rows.foreach { case (user, _, eid, v) =>
      val y = state.get(user).map(p => 0.7 * p + 0.3 * v).getOrElse(v)
      state(user) = y
      expected(eid) = y
    }
    assert(got.size === expected.size)
    expected.foreach { case (eid, y) =>
      assert(math.abs(got(eid) - y) < 1e-9, s"event $eid")
    }
  }

  test("ewm: null values emit null and leave state untouched") {
    val df = Seq((1L, 1L, Some(10.0)), (1L, 2L, None), (1L, 3L, Some(20.0)))
      .toDF("u", "t", "v")
    val got = Ewm.ewmMean(df, Seq("u"), Seq("t"), "v", 0.5, "e")
      .orderBy("t").collect()
    assert(got(0).getDouble(3) === 10.0)
    assert(got(1).isNullAt(3))
    assert(got(2).getDouble(3) === 15.0) // 0.5*10 + 0.5*20: state skipped the null
  }
}
