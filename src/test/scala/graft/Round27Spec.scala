package graft

import org.apache.spark.sql.functions._

/** Round-31 wave: distributed ntile, lexical richness, Zipf slope,
  * conversion paths.
  */
class Round27Spec extends SparkSpec {

  test("ntile quartiles: balanced buckets, monotone ranges, full coverage") {
    val rows = SparkEntry.queries("q339_ntile_quartiles")(spark, sf).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L, 4L))
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == n)
    val sizes = rows.map(_.getAs[Long]("n_orders"))
    assert(sizes.max - sizes.min <= 1) // ntile balance
    // ranges are monotone: bucket k's max ≤ bucket k+1's min
    for (i <- 0 until 3)
      assert(rows(i).getAs[Double]("max_tp") <= rows(i + 1).getAs[Double]("min_tp"))
  }

  test("lexical richness invariants and driver replay") {
    val rows = SparkEntry.queries("q340_lexical_richness")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("hapax") <= r.getAs[Long]("vocab"))
      assert(r.getAs[Long]("vocab") <= r.getAs[Long]("tokens"))
    }
    val src = rows.head.getAs[String]("source")
    val toks = Tables.documents(spark, sf).filter(col("source") === src)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
    val counts = toks.groupBy(identity).view.mapValues(_.length)
    val r = rows.find(_.getAs[String]("source") == src).get
    assert(r.getAs[Long]("vocab") == counts.size)
    assert(r.getAs[Long]("tokens") == toks.length)
    assert(r.getAs[Long]("hapax") == counts.count(_._2 == 1))
  }

  test("Zipf slope is negative and replays driver-side") {
    val rows = SparkEntry.queries("q341_zipf_slope")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) assert(r.getAs[Double]("slope") < 0, r.getString(0))
    val src = rows.head.getAs[String]("source")
    val toks = Tables.documents(spark, sf).filter(col("source") === src)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
    val top = toks.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(100)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (BigDecimal(math.round(math.log(i + 1.0) * 1e6)) / 1e6,
        BigDecimal(math.round(math.log(c.toDouble) * 1e6)) / 1e6)
    }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r = rows.find(_.getAs[String]("source") == src).get
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-5)
  }

  test("conversion paths end at the first purchase") {
    val rows = SparkEntry.queries("q342_conversion_paths")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    for (r <- rows) {
      val steps = r.getAs[String]("path").split(">")
      assert(steps.last == "purchase")
      assert(steps.dropRight(1).forall(_ != "purchase")) // FIRST purchase cuts
    }
    // ranking is by count desc then path
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sortBy(-_)))
  }
}
