package graft

import org.apache.spark.sql.functions._

/** Round-29 wave: KMV set ops, RFM, attribution, Benford, streaming
  * A/B, KL anomaly.
  */
class Round25Spec extends SparkSpec {

  test("KMV set-op estimates track the exact union and Jaccard") {
    val est = SparkEntry.queries("q327_kmv_setops")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    // exact union / Jaccard per source pair from the same tokenization
    val tok = Tables.documents(spark, sf)
      .select(col("source"),
        explode(filter(split(col("text"), " "), w => w =!= "")).as("w"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc = tok.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val srcs = bySrc.keys.toSeq.sorted
    for (i <- srcs.indices; jj <- i + 1 until srcs.length) {
      val (s1, s2) = (srcs(i), srcs(jj))
      val u = (bySrc(s1) union bySrc(s2)).size.toDouble
      val jac = (bySrc(s1) intersect bySrc(s2)).size.toDouble / u
      val (uEst, jEst) = est((s1, s2))
      // KMV with k=64: relative error ~ 1/sqrt(63) ≈ 12.6%; allow 4σ
      assert(math.abs(uEst - u) / u < 0.5, s"($s1,$s2) union $uEst vs $u")
      assert(math.abs(jEst - jac) < 0.35, s"($s1,$s2) jacc $jEst vs $jac")
    }
    assert(est.size == srcs.length * (srcs.length - 1) / 2)
  }

  test("RFM segments cover all customers and scores are in 1..3") {
    val rows = SparkEntry.queries("q328_rfm_segments")(spark, sf).collect()
    val nCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_cust")).sum == nCust)
    for (r <- rows; cName <- Seq("r_score", "f_score", "m_score")) {
      val v = r.getAs[Long](cName)
      assert(v >= 1 && v <= 3)
    }
    // tercile sanity on one axis: no single r_score holds > 60% of customers
    val byR = rows.groupBy(_.getAs[Long]("r_score")).view
      .mapValues(_.map(_.getAs[Long]("n_cust")).sum).toMap
    assert(byR.values.max.toDouble / nCust < 0.6)
  }

  test("linear attribution credit sums to the attributed purchase count") {
    val rows = SparkEntry.queries("q329_linear_attribution")(spark, sf).collect()
    val credit = rows.map(_.getAs[Double]("credit")).sum
    // each attributed purchase contributes exactly 1.0 split across
    // channels (up to the defined 6dp per-weight rounding)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("t"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t").as("pt"))
    val touch = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("t").as("tt"))
    val attributed = purch.join(touch, Seq("user_id"))
      .filter(col("tt") < col("pt")
        && col("tt") >= col("pt") - lit(7L * 86400000000L))
      .select(col("user_id"), col("pt")).distinct().count()
    assert(math.abs(credit - attributed) < attributed * 1e-4 + 0.01)
  }

  test("Benford shares sum to one and chi2 is non-negative") {
    val rows = SparkEntry.queries("q330_benford")(spark, sf).collect()
    assert(rows.length <= 9 && rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("obs_share")).sum - 1.0) < 1e-4)
    val expAll = (1 to 9).map(dd => math.log10(1.0 + 1.0 / dd)).sum
    assert(math.abs(expAll - 1.0) < 1e-12) // Benford shares are a distribution
    val chi2 = rows.head.getAs[Double]("chi2")
    assert(chi2 >= 0 && rows.forall(_.getAs[Double]("chi2") == chi2))
  }

  test("streaming A/B monitor equals the batch q315 answer") {
    val streamR = SparkEntry.queries("q331_stream_ab")(spark, sf).collect()(0)
    val batchR = SparkEntry.queries("q315_ab_test")(spark, sf).collect()(0)
    assert(streamR.toSeq == batchR.toSeq)
  }

  test("KL anomaly ranking is sorted, non-negative, top-20") {
    val rows = SparkEntry.queries("q332_kl_anomaly")(spark, sf).collect()
    assert(rows.length <= 20)
    val kls = rows.map(_.getAs[Double]("kl"))
    assert(kls.sameElements(kls.sortBy(-_)))
    // KL ≥ 0 mathematically; 6dp term rounding can dip a hair below
    assert(kls.forall(_ >= -1e-5))
  }
}
