package graft

import org.apache.spark.sql.functions._

/** Round-32/33 waves: streaming KMV, covariance matrix, mutual
  * information, centroid similarity, window funnel, stopwords,
  * cluster histogram.
  */
class Round28Spec extends SparkSpec {

  test("streaming KMV estimates equal the batch q154 sketch") {
    val stream = SparkEntry.queries("q343_stream_kmv")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val batch = SparkEntry.queries("q154_kmv_distinct")(spark, sf)
      .collect().map(r => (r.getString(0), r.getAs[Double]("est"))).toMap
    assert(stream == batch && batch.nonEmpty)
  }

  test("covariance matrix: full upper triangle, PSD diagonal, replay") {
    val rows = SparkEntry.queries("q344_cov_matrix")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.size == 64 * 65 / 2)
    for (i <- 0L until 64L) assert(rows((i, i)) >= 0, s"var($i)")
    // replay cov(0, 1) driver-side
    val vs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.round(v.toDouble * 1e6) / 1e6))
    val n = vs.length.toDouble
    val (x0, x1) = (vs.map(_(0)), vs.map(_(1)))
    val cov = (x0.zip(x1).map { case (a, b) => a * b }.sum
      - x0.sum * x1.sum / n) / n
    assert(math.abs(rows((0L, 1L)) - cov) < 1e-4)
  }

  test("mutual information is non-negative and bounded by entropies") {
    val r = SparkEntry.queries("q345_mutual_information")(spark, sf).collect()(0)
    val mi = r.getAs[Double]("mi")
    assert(mi >= -1e-5)
    val docs = Tables.documents(spark, sf)
    val hS = math.log(docs.select("source").distinct().count().toDouble)
    val hL = math.log(docs.select("lang").distinct().count().toDouble)
    assert(mi <= math.min(hS, hL) + 1e-6)
  }

  test("centroid similarity: all label pairs, cosine in [-1, 1]") {
    val rows = SparkEntry.queries("q346_centroid_similarity")(spark, sf).collect()
    val k = Tables.embeddings(spark, sf).select("label").distinct().count()
    assert(rows.length == k * (k - 1) / 2)
    for (r <- rows) {
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getLong(0) < r.getLong(1))
    }
  }

  test("window funnel: levels partition signup users, monotone reachability") {
    val rows = SparkEntry.queries("q347_window_funnel")(spark, sf).collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("n_users"))).toMap
    assert(rows.keySet.subsetOf(Set(1L, 2L, 3L)))
    val signups = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.values.sum == signups) // every signup user gets exactly one max level
  }

  test("stopword discovery: df_ratio above half everywhere, tf ≥ df") {
    val rows = SparkEntry.queries("q348_stopword_discovery")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Double]("df_ratio") > 0.5)
      assert(r.getAs[Long]("tf") >= r.getAs[Long]("df"))
    }
  }

  test("label outliers are below threshold and ranked worst-first") {
    val rows = SparkEntry.queries("q350_label_outliers")(spark, sf).collect()
    assert(rows.length <= 50)
    val cs = rows.map(_.getAs[Double]("cos"))
    assert(cs.forall(_ < 0.1))
    assert(cs.sameElements(cs.sorted))
  }

  test("streaming reservoir equals the batch q337 sample") {
    val stream = SparkEntry.queries("q351_stream_reservoir")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = SparkEntry.queries("q337_reservoir_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(stream == batch && batch.nonEmpty)
  }

  test("duplicate-cluster histogram mass equals the component rows") {
    val hist = SparkEntry.queries("q349_dup_cluster_histogram")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = hist.map { case (sz, n) => sz * n }.sum
    val compRows = SparkEntry.queries("q114_dedup_clusters")(spark, sf).count()
    assert(total == compRows && hist.forall(_._1 >= 1))
  }
}
