package graft

import org.apache.spark.sql.functions._

/** Round-40 wave: item-item CF, Markov accuracy, churn features. */
class Round31Spec extends SparkSpec {

  test("item-item CF: ≤5 neighbors per item, sim in (0,1], symmetric base") {
    val rows = SparkEntry.queries("q365_item_item_cf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("sim")))
    assert(rows.nonEmpty)
    val perItem = rows.groupBy(_._1).view.mapValues(_.length)
    assert(perItem.values.forall(_ <= 5))
    assert(rows.forall(r => r._3 > 0 && r._3 <= 1.0))
    assert(rows.forall(r => r._1 != r._2))
  }

  test("Markov accuracy beats the per-source majority-class floor by construction") {
    val rows = SparkEntry.queries("q366_markov_accuracy")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val acc = r.getAs[Double]("accuracy")
      assert(acc > 0 && acc <= 1)
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n"))
      // argmax predictor's accuracy = share of the modal destination,
      // which is ≥ 1/(number of event types)
      assert(acc >= 1.0 / 5 - 1e-9)
    }
  }

  test("streaming per-day DAU sketch tracks the exact DAU") {
    val est = SparkEntry.queries("q368_stream_dau_kmv")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(countDistinct(col("user_id")).as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(est.keySet == exact.keySet)
    for ((day, e) <- est) {
      val x = exact(day).toDouble
      // below the sketch fill (64) the estimate is exact; above, ~1/√63
      if (x <= 64) assert(e == x, s"day $day")
      else assert(math.abs(e - x) / x < 0.5, s"day $day")
    }
  }

  test("Jaccard histogram bins cover exactly the verified q55 pairs") {
    val hist = SparkEntry.queries("q369_jaccard_histogram")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = SparkEntry.queries("q55_minhash_lsh")(spark, sf).count()
    assert(hist.values.sum == pairs)
    assert(hist.keySet.forall(b => b >= 5 && b <= 9))
  }

  test("cross-source dup matrix mass equals the verified pair count") {
    val m = SparkEntry.queries("q370_cross_source_dups")(spark, sf).collect()
    val total = m.map(_.getAs[Long]("n_pairs")).sum
    assert(total == SparkEntry.queries("q55_minhash_lsh")(spark, sf).count())
    assert(m.forall(r => r.getString(0) <= r.getString(1)))
  }

  test("churn features are leakage-safe and label-consistent") {
    val rows = SparkEntry.queries("q367_churn_features")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cut = ev.map(_._2).max - 7L * 86400000000L
    val recentUsers = ev.filter(_._2 > cut).map(_._1).toSet
    for (r <- rows.take(100)) {
      val u = r.getLong(0)
      assert((r.getAs[Long]("churned") == 1L) == !recentUsers.contains(u))
      assert(r.getAs[Long]("days_since_last") >= 0)
      assert(r.getAs[Long]("n_purchases") <= r.getAs[Long]("n_events"))
    }
    // only users with pre-cut activity appear (features cannot be empty)
    val preUsers = ev.filter(_._2 <= cut).map(_._1).toSet
    assert(rows.map(_.getLong(0)).toSet == preUsers)
  }
}
