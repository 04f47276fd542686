package graft

import org.apache.spark.sql.functions._

class Round21Spec extends SparkSpec {

  test("HITS: sides match the bipartite prefix, mass ~ Scale, partition-invariant") {
    import graft.operators.{Hits, PageRank}
    val e = PageRank.tradeEdges(spark, sf)
    val r1 = Hits.run(e, "cust", "supp", iters = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    r1.foreach { case (id, side, score) =>
      if (side == "hub") assert(id.startsWith("c"), s"hub $id")
      else assert(id.startsWith("s"), s"auth $id")
      assert(score >= 0L)
    }
    Seq("hub", "auth").foreach { side =>
      val mass = r1.filter(_._2 == side).map(_._3).sum
      // the divisor d = floor(Σ/Scale) floors, so Σ(x div d) can land a
      // bit ABOVE Scale (≤ Σ/d ≈ Scale·(1 + 1/d)); bound both directions
      assert(mass < (Hits.Scale * 11) / 10 && mass > (Hits.Scale * 4) / 5,
        s"$side mass $mass")
    }
    val r2 = Hits.run(e.repartition(7), "cust", "supp", iters = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(r1.sorted.sameElements(r2.sorted))
  }

  test("chi-squared statistic is non-negative with the right dof") {
    val r = SparkEntry.queries("q293_chi2")(spark, sf).head()
    assert(r.getDouble(0) >= 0.0)
    val nR = Tables.documents(spark, sf).select("source").distinct().count()
    val nC = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(r.getLong(1) == (nR - 1) * (nC - 1))
  }

  test("systematic sample picks every 50th row exactly") {
    val n = Tables.documents(spark, sf).count()
    val got = SparkEntry.queries("q295_systematic_sample")(spark, sf)
      .collect().map(_.getLong(2)).sorted
    assert(got.length == ((n + 49) / 50))
    got.zipWithIndex.foreach { case (rn, i) => assert(rn == i * 50L + 1) }
  }

  test("time-to-convert deltas are positive and p50 <= p90") {
    val r = SparkEntry.queries("q296_time_to_convert")(spark, sf).head()
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= r.getDouble(2))
  }
}
