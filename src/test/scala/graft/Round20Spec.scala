package graft

import org.apache.spark.sql.functions._

class Round20Spec extends SparkSpec {

  test("streaming OLS equals batch q288") {
    val stream = graft.streaming.EventStreams.olsStream(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sorted
    val batch = SparkEntry.queries("q288_groupwise_ols")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sorted
    assert(stream.sameElements(batch))
  }

  test("bootstrap CI brackets the point mean and has positive width") {
    val rows = SparkEntry.queries("q290_bootstrap_ci")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, mean, lo, hi) =>
      assert(lo < hi, s"$t: degenerate interval [$lo, $hi]")
      // Poisson-bootstrap resample means concentrate around the point
      // estimate; the 90% CI bracketing it is the expected behavior on
      // thousands of rows per type
      assert(mean > lo && mean < hi, s"$t: mean $mean outside [$lo, $hi]")
    }
  }

  test("Mann-Whitney U: rank-sum identity R1+R2 = N(N+1)/2 and U bounds") {
    val r = SparkEntry.queries("q292_mannwhitney")(spark, sf).head()
    val (n1, n2, r1, u) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val n = n1 + n2
    // all ranks partition the 1..N rank mass
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase") && col("value").isNotNull)
    val ranked = graft.operators.RankMethods.rank(
      ev.select("event_type", "value"), "value", "r")
    val rAll = ranked.agg(sum("r_avg")).head().getDouble(0)
    assert(rAll == n.toDouble * (n + 1) / 2)
    assert(u >= 0.0 && u <= n1.toDouble * n2, s"U=$u outside [0, n1*n2]")
    assert(r1 >= n1.toDouble * (n1 + 1) / 2)
  }

  test("KS drift: identical samples give D=0, disjoint give D=1, self vs corpus in (0,1)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def ksOf(df1: Seq[Long], df2: Seq[Long]): Double = {
      val a = df1.map(v => ("src0", v)) ++ df2.map(v => ("src1", v))
      val docs = a.toDF("source", "n_chars")
      def side(src: String, c: String) = docs.filter(col("source") === src)
        .groupBy("n_chars").agg(count(lit(1)).as(c))
      val tot = docs.agg(
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("n1"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("n2"))
      val merged = side("src0", "c1").join(side("src1", "c2"), Seq("n_chars"), "full_outer")
        .select(col("n_chars"), coalesce(col("c1"), lit(0L)).as("c1"),
          coalesce(col("c2"), lit(0L)).as("c2"))
      val w = Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      merged.select(sum(col("c1")).over(w).as("f1"), sum(col("c2")).over(w).as("f2"))
        .crossJoin(broadcast(tot))
        .select(abs(col("f1").cast("double") / col("n1").cast("double")
          - col("f2").cast("double") / col("n2").cast("double")).as("diff"))
        .agg(max(col("diff"))).head().getDouble(0)
    }
    assert(ksOf(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 0.0)
    assert(ksOf(Seq(1L, 2L), Seq(10L, 11L)) == 1.0)
    val d = SparkEntry.queries("q291_ks_drift")(spark, sf).head().getDouble(0)
    assert(d >= 0.0 && d < 1.0)
  }
}
