package graft

import org.apache.spark.sql.functions._

/** Round-28 wave: triangles, fuzzy edit-distance, Welch t, ANOVA,
  * CUSUM changepoint, feature scaling.
  */
class Round24Spec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  test("triangle count: known graphs") {
    import graft.operators.Triangles
    // K4: 4 triangles
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = Triangles.count(k4).collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 6 && r.getLong(2) == 4)
    // path 1-2-3-4: no triangles
    val path = Triangles.count(edges((1L, 2L), (2L, 3L), (3L, 4L))).collect()(0)
    assert(path.getLong(2) == 0)
    // two triangles sharing edge (1,2)
    val twin = Triangles.count(
      edges((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))).collect()(0)
    assert(twin.getLong(2) == 2)
    // star: hub with leaves, no closure
    val star = Triangles.count(edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))).collect()(0)
    assert(star.getLong(2) == 0)
  }

  test("triangle count: broadcast and shuffle-hash closure branches agree") {
    import graft.operators.Triangles
    val e = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L), (1L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L))
    val bc = Triangles.count(e).collect()(0)                      // broadcast path
    val sh = Triangles.count(e, broadcastLimit = 0L).collect()(0) // shuffle-hash path
    assert(bc.toSeq == sh.toSeq)
  }

  test("triangle count is partition-invariant") {
    import graft.operators.Triangles
    val e = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L), (1L, 5L), (4L, 5L))
    val once = Triangles.count(e).collect()(0).getLong(2)
    val rep = Triangles.count(e.repartition(7)).collect()(0).getLong(2)
    assert(once == rep)
  }

  test("fuzzy edit-distance matches a driver brute force over the same blocks") {
    val q = SparkEntry.queries("q322_fuzzy_editdist")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val names = Tables.part(spark, sf).select("p_name").distinct()
      .collect().map(_.getString(0))
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val brute = (for {
      x <- names; y <- names
      if x < y
      if x.split(" ")(1) == y.split(" ")(1)
      if math.abs(x.length - y.length) <= 2
      dist = lev(x, y)
      if dist >= 1 && dist <= 2
    } yield (x, y, dist.toLong)).toSet
    assert(q == brute && brute.nonEmpty)
  }

  test("Welch t replays driver-side") {
    val r = SparkEntry.queries("q323_welch_ttest")(spark, sf).collect()(0)
    val vals = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), col("value")).collect()
      .map(row => (row.getString(0), math.round(row.getDouble(1) * 1e6) / 1e6))
    def mom(g: String) = {
      val xs = vals.filter(_._1 == g).map(v => BigDecimal(v._2))
      (xs.length.toDouble, xs.sum.toDouble, xs.map(x => x * x).sum.toDouble)
    }
    val (n1, s1, q1) = mom("purchase"); val (n2, s2, q2) = mom("view")
    val v1 = (q1 - s1 * s1 / n1) / (n1 - 1)
    val v2 = (q2 - s2 * s2 / n2) / (n2 - 1)
    val se2 = v1 / n1 + v2 / n2
    val t = (s1 / n1 - s2 / n2) / math.sqrt(se2)
    assert(r.getAs[Long]("n1") == n1.toLong && r.getAs[Long]("n2") == n2.toLong)
    assert(math.abs(r.getAs[Double]("t") - t) < 1e-5)
    val dof = se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
      + (v2 / n2) * (v2 / n2) / (n2 - 1))
    assert(math.abs(r.getAs[Double]("dof") - dof) < 1e-4)
    // dof must land between min(n)-1 and n1+n2-2 (Welch bounds)
    assert(r.getAs[Double]("dof") >= math.min(n1, n2) - 1
      && r.getAs[Double]("dof") <= n1 + n2 - 2)
  }

  test("ANOVA F replays driver-side and SSB+SSW = SST") {
    val r = SparkEntry.queries("q324_anova_f")(spark, sf).collect()(0)
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(row => (row.getString(0), math.round(row.getDouble(1) * 1e6) / 1e6))
    val groups = vals.groupBy(_._1).toSeq.sortBy(_._1)
    val qsum = groups.map { case (_, xs) =>
      val s = xs.map(v => BigDecimal(v._2)).sum.toDouble
      s * s / xs.length
    }.sum
    val nd = vals.length.toDouble
    val sd = vals.map(v => BigDecimal(v._2)).sum.toDouble
    val ssd = vals.map(v => BigDecimal(v._2) * BigDecimal(v._2)).sum.toDouble
    val ssb = qsum - sd * sd / nd
    val ssw = ssd - qsum
    assert(math.abs(r.getAs[Double]("ssb") - ssb) < 1e-4)
    assert(math.abs(r.getAs[Double]("ssw") - ssw) < 1e-4)
    // decomposition: SSB + SSW = SST
    val sst = ssd - sd * sd / nd
    assert(math.abs((r.getAs[Double]("ssb") + r.getAs[Double]("ssw")) - sst) < 1e-3)
    assert(r.getAs[Double]("f") > 0)
  }

  test("CUSUM changepoint replays driver-side exactly") {
    val out = SparkEntry.queries("q325_cusum_changepoint")(spark, sf)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(math.round(r.getDouble(2) * 1e6)) / 1e6))
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap
    val byType = daily.groupBy(_._1._1)
    for ((et, cells) <- byType) {
      val series = cells.toSeq.map { case ((_, day), x) => (day, x) }.sortBy(_._1)
      val n = series.length
      val tt = series.map(_._2).sum
      var cum = BigDecimal(0)
      val devs = series.zipWithIndex.map { case ((day, x), idx) =>
        cum += x
        (day, cum * n - (idx + 1) * tt)
      }
      val best = devs.maxBy { case (day, dev) => (dev.abs, -day) }
      assert(out(et)._1 == best._1, s"$et changepoint")
      assert(math.abs(out(et)._2 - best._2.toDouble) < 1e-6, s"$et dev")
    }
  }

  test("feature scaling: standardized dims have mean 0 / var 1, norms replay") {
    val out = SparkEntry.queries("q326_feature_scaling")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v => math.round(v.toDouble * 1e6) / 1e6).toArray))
    val dim = vecs.head._2.length
    val n = vecs.length.toDouble
    val mu = Array.tabulate(dim)(j => vecs.map(_._2(j)).sum / n)
    val sg = Array.tabulate(dim) { j =>
      math.sqrt(vecs.map(v => (v._2(j) - mu(j)) * (v._2(j) - mu(j))).sum / n)
    }
    for ((id, v) <- vecs.take(20)) {
      val zn = math.sqrt((0 until dim).map { j =>
        val z = (v(j) - mu(j)) / sg(j); z * z
      }.sum)
      assert(math.abs(out(id) - zn) < 1e-4, s"vec $id")
    }
    // every standardized vector's norm² averages to ~dim across vectors
    val meanSq = out.values.map(z => z * z).sum / n
    assert(math.abs(meanSq - dim) < dim * 0.02)
  }
}
