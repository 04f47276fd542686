package graft

import org.apache.spark.sql.functions._

/** Round-30 wave: Holt smoothing, Jaro-Winkler, streaming CUSUM,
  * skew diagnostics, reservoir sampling, IQR outliers.
  */
class Round26Spec extends SparkSpec {

  test("Jaro-Winkler native expression matches the literature values") {
    import graft.functions.JaroWinklerSim
    import spark.implicits._
    val rows = Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"), ("abqrst", "abzzzz"),
      ("same", "same"), ("ab", "ba"), ("abc", "xyz"), ("abcdef", "bcadef"))
      .toDF("a", "b")
      .select(JaroWinklerSim(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0))
    assert(math.abs(rows(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(rows(1) - 0.8133333333333332) < 1e-12)
    assert(math.abs(rows(2) - 0.5555555555555555) < 1e-12) // below boost threshold
    assert(rows(3) == 1.0)
    assert(rows(4) == 0.0) // window 0: no matches
    assert(rows(5) == 0.0)
    assert(math.abs(rows(6) - 0.9444444444444445) < 1e-12) // odd t → integer halving
  }

  test("Holt smoothing replays the recurrence driver-side") {
    val out = SparkEntry.queries("q333_holt_smoothing")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val daily = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(math.round(r.getDouble(2) * 1e6)) / 1e6))
      .groupBy(r => (r._1, r._2))
      .map { case ((et, day), xs) =>
        (et, day, xs.map(_._3).sum.toDouble / xs.length) }
    for ((et, series) <- daily.groupBy(_._1)) {
      val xs = series.toSeq.sortBy(_._2).map(_._3)
      var l = xs.head
      var b = 0.0
      for (x <- xs.tail) {
        val nl = 0.3 * x + 0.7 * (l + b)
        b = 0.2 * (nl - l) + 0.8 * b
        l = nl
      }
      assert(math.abs(out(et)._1 - l) < 1e-5, s"$et level")
      assert(math.abs(out(et)._2 - b) < 1e-5, s"$et trend")
      assert(math.abs(out(et)._3 - (l + b)) < 1e-5, s"$et forecast")
    }
  }

  test("streaming CUSUM equals the batch changepoints") {
    val stream = SparkEntry.queries("q335_stream_cusum")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = SparkEntry.queries("q325_cusum_changepoint")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stream == batch && batch.nonEmpty)
  }

  test("skew report totals replay") {
    val r = SparkEntry.queries("q336_skew_report")(spark, sf).collect()(0)
    val li = Tables.lineitem(spark, sf)
    assert(r.getAs[Long]("n_rows") == li.count())
    assert(r.getAs[Long]("n_keys") == li.select("l_partkey").distinct().count())
    val counts = li.groupBy("l_partkey").count().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val mx = counts.map(_._2).max
    assert(r.getAs[Long]("top_n") == mx)
    // argmax tiebreak: smallest key among max-count keys
    assert(r.getAs[Long]("top_key") == counts.filter(_._2 == mx).map(_._1).min)
    assert(r.getAs[Double]("cv") > 0)
  }

  test("reservoir sample: exactly min(5, group size) per source, stable") {
    val a = SparkEntry.queries("q337_reservoir_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val b = SparkEntry.queries("q337_reservoir_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b) // deterministic
    val sizes = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val perSrc = a.groupBy(_._1).view.mapValues(_.size).toMap
    for ((src, n) <- sizes) assert(perSrc(src) == math.min(5L, n))
  }

  test("IQR outlier bounds replay for l_discount") {
    val r = SparkEntry.queries("q338_iqr_outliers")(spark, sf).collect()
      .find(_.getString(0) == "l_discount").get
    val vs = Tables.lineitem(spark, sf).select("l_discount").collect()
      .map(x => math.round(x.getDouble(0) * 1e6) / 1e6).sorted
    def q(p: Double): Double = {
      val h = (vs.length - 1) * p
      val lo = h.toInt
      vs(lo) + (h - lo) * (vs(math.min(lo + 1, vs.length - 1)) - vs(lo))
    }
    val (q1, q3) = (q(0.25), q(0.75))
    assert(math.abs(r.getAs[Double]("q1") - q1) < 1e-6)
    assert(math.abs(r.getAs[Double]("q3") - q3) < 1e-6)
    val lo = q1 - 1.5 * (q3 - q1)
    val hi = q3 + 1.5 * (q3 - q1)
    assert(r.getAs[Long]("n_low") == vs.count(_ < lo))
    assert(r.getAs[Long]("n_high") == vs.count(_ > hi))
  }
}
