package graft

import org.apache.spark.sql.functions._

/** Round-38 wave: decayed counts, trending values, stickiness,
  * entity resolution, schema-merge read.
  */
class Round30Spec extends SparkSpec {

  test("decayed counts replay driver-side and stay below n") {
    val out = SparkEntry.queries("q358_decayed_counts")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val ts = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts)").as("t")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val tmax = ts.map(_._2).max
    for ((et, (n, dec)) <- out) {
      assert(dec <= n && dec > 0)
      val replay = ts.filter(_._1 == et).map { case (_, t) =>
        BigDecimal(math.round(math.pow(0.5, (tmax - t).toDouble / 4.32e10) * 1e6)) / 1e6
      }.sum.toDouble
      assert(math.abs(dec - replay) < 1e-6, et)
    }
  }

  test("trending values: support floor, descending lift, bounded") {
    val rows = SparkEntry.queries("q359_trending_terms")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getAs[Long]("r") >= 5))
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.sameElements(lifts.sortBy(-_)))
  }

  test("stickiness: DAU bounded by MAU, ratio in (0, 1]") {
    val rows = SparkEntry.queries("q360_stickiness")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("mau"))
      val st = r.getAs[Double]("stickiness")
      assert(st > 0 && st <= 1)
    }
  }

  test("entity resolution recovers the original names") {
    val rows = SparkEntry.queries("q361_entity_resolution")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 0.85))
    // a dirty name (original minus last char) should overwhelmingly
    // resolve back to a name it prefixes
    val recovered = rows.count { case (dn, m, _) => m.startsWith(dn) }
    assert(recovered.toDouble / rows.length >= 0.9)
  }

  test("parquet codecs round-trip identically") {
    val rows = SparkEntry.queries("q363_parquet_codecs")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("snappy", "zstd", "gzip"))
    assert(rows.map(_.getLong(1)).distinct.length == 1)
    assert(rows.map(_.getDouble(2)).distinct.length == 1)
  }

  test("multiline CSV round-trip pins every selected document") {
    val n = SparkEntry.queries("q364_csv_multiline")(spark, sf).count()
    val expect = Tables.documents(spark, sf)
      .filter(expr("doc_id % 97 = 0")).count()
    assert(n == expect && n > 0)
  }

  test("schema-merge read covers all rows with nulls for the missing column") {
    val r = SparkEntry.queries("q362_parquet_schema_merge")(spark, sf).collect()(0)
    val o = Tables.orders(spark, sf)
    assert(r.getAs[Long]("n_rows") == o.count())
    val odd = o.filter(expr("o_orderkey % 2 = 1")).count()
    assert(r.getAs[Long]("n_with_priority") == odd)
  }
}
