package graft

import org.apache.spark.sql.functions._

class Round22Spec extends SparkSpec {
  import spark.implicits._

  test("Spearman is 1 on a monotone pair and in [-1,1] on the corpus") {
    import graft.operators.RankMethods
    import graft.functions.Num
    val mono = (1 to 40).map(i => (i.toLong, i.toDouble, (i * 3).toLong))
      .toDF("event_id", "value", "k")
    val ranked = RankMethods.rank(RankMethods.rank(mono, "value", "rx"), "k", "ry")
    val x = col("rx_avg").cast("decimal(18,1)")
    val y = col("ry_avg").cast("decimal(18,1)")
    val r = ranked.agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).cast("decimal(38,2)").as("sxy"),
        sum(x * x).cast("decimal(38,2)").as("sxx"),
        sum(y * y).cast("decimal(38,2)").as("syy"))
      .select(Num.rnd((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6))
      .head().getDouble(0)
    assert(r == 1.0)
    val corpus = SparkEntry.queries("q297_spearman")(spark, sf).head().getDouble(1)
    assert(corpus >= -1.0 && corpus <= 1.0)
  }

  test("vocabulary entropy is bounded by ln(64) and positive") {
    val rows = SparkEntry.queries("q300_vocab_entropy")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(rows.nonEmpty)
    rows.foreach { case (src, h) =>
      assert(h > 0.0 && h <= math.log(64.0) + 1e-6, s"$src entropy $h")
    }
  }

  test("source overlap: jaccard in (0,1], symmetric pair set complete") {
    val rows = SparkEntry.queries("q299_source_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    // shared synthetic vocabulary → every pair overlaps
    assert(rows.length == (nSources * (nSources - 1)) / 2)
    rows.foreach { case (a, b, j) =>
      assert(a < b)
      assert(j > 0.0 && j <= 1.0, s"($a,$b) jaccard $j")
    }
  }

  test("autocorrelation is in [-1,1] with one pair per consecutive hour") {
    val r = SparkEntry.queries("q298_autocorr")(spark, sf).head()
    assert(r.getLong(0) > 0)
    assert(math.abs(r.getDouble(1)) <= 1.0)
  }
}
