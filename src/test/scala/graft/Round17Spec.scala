package graft

import org.apache.spark.sql.functions._

class Round17Spec extends SparkSpec {

  test("histogram quantile estimate brackets the rank-ceil(q·n) order statistic") {
    val q = SparkEntry.queries("q271_hist_quantiles")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val byType = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getDouble(1)).sorted
      }
    assert(byType.nonEmpty)
    byType.foreach { case (t, vs) =>
      val (e50, e90, e99) = q(t)
      val w = (vs.last - vs.head) / 32.0
      // the estimator returns the UPPER edge of the bucket holding the
      // order statistic at 1-based rank ceil(q·n) — that statistic (not
      // the interpolated percentile, which can sit one rank lower and
      // buckets away across an empty-bucket gap) lies within one width
      // below the estimate
      def stat(qq: Double): Double = vs(math.ceil(qq * vs.length).toInt - 1)
      Seq(0.5 -> e50, 0.9 -> e90, 0.99 -> e99).foreach { case (qq, est) =>
        val os = stat(qq)
        assert(os <= est + 1e-9 && os >= est - w - 1e-9,
          s"$t q=$qq: order stat $os outside (est $est − width $w]")
      }
    }
  }

  test("transition probabilities sum to 1 per source and counts match pair total") {
    val t = SparkEntry.queries("q270_transitions")(spark, sf)
    val sums = t.groupBy("src").agg(sum("p").as("sp"), sum("n").as("sn"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, r.getString(0)))
    val nPairs = t.agg(sum("n")).head().getLong(0)
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(nPairs == expected, "one transition per event beyond each user's first")
  }

  test("stack is the inverse of unstack on the (source, lang) count table") {
    import graft.api.GFrame
    val counts = Tables.documents(spark, sf)
      .groupBy("source", "lang").agg(count(lit(1)).as("value"))
    val wide = GFrame(counts, Seq("source", "lang"))
      .unstack(pivotValues = Some(Seq("de", "en", "es", "fr", "zh")))
    val back = wide.stack(varName = "lang")
      .apply(col("value").isNotNull) // unstack padded missing pairs with null
      .df.select("source", "lang", "value")
    val a = back.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    val b = counts.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }

  test("combine_first and update follow pandas null-preference rules") {
    import graft.api.GFrame
    import spark.implicits._
    val self = Seq((1L, Some(10.0)), (2L, None), (3L, Some(30.0)))
      .toDF("k", "v")
    val other = Seq((2L, Some(99.0)), (3L, None), (4L, Some(44.0)))
      .toDF("k", "v")
    val cf = GFrame(self, Seq("k")).combineFirst(GFrame(other, Seq("k")))
      .df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // self wins where non-null; other fills holes; union of rows
    assert(cf == Map(1L -> Some(10.0), 2L -> Some(99.0), 3L -> Some(30.0),
      4L -> Some(44.0)))
    val up = GFrame(self, Seq("k")).updateFrom(GFrame(other, Seq("k")))
      .df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // self's shape kept (no row 4); other's non-null overwrites (row 2);
    // other's null never clobbers (row 3)
    assert(up == Map(1L -> Some(10.0), 2L -> Some(99.0), 3L -> Some(30.0)))
  }

  test("cohort retention: offset-0 row covers every signup cohort's users") {
    val r = SparkEntry.queries("q269_cohort_retention")(spark, sf)
    val at0 = r.filter(col("off") === 0).agg(sum("n_users")).head().getLong(0)
    val nSignupUsers = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    // every signed-up user is active in their own cohort week (the
    // signup event itself) — offset 0 counts exactly those users
    assert(at0 == nSignupUsers)
  }
}
