package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class StreamAsofSpec extends SparkSpec {

  test("streaming asof join equals the batch asof replay") {
    val got = EventStreams.asofStreaming(spark, sf, toleranceMinutes = 10)
      .select("p_id", "user_id", "c_id", "c_value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        unix_micros(col("ts")).as("pt"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("cu"),
        unix_micros(col("ts")).as("ct"), col("value"))
    val w = Window.partitionBy("p_id").orderBy(col("ct").desc, col("c_id").desc)
    val m = p.join(c, col("user_id") === col("cu") &&
        col("ct") <= col("pt") && col("pt") - col("ct") <= 600000000L)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("p_id").as("mp"), col("c_id"), col("value"))
    val expect = p.join(m, col("p_id") === col("mp"), "left")
      .select("p_id", "user_id", "c_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

    assert(got.size === expect.size)
    assert(got === expect)
  }

  test("streaming asof emits exactly one row per purchase") {
    val out = EventStreams.asofStreaming(spark, sf, toleranceMinutes = 10)
    val nP = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(out.count() === nP)
    assert(out.select("p_id").distinct().count() === nP)
  }
}
