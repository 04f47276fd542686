package graft

import org.apache.spark.sql.functions._

class Round23Spec extends SparkSpec {

  test("weighted PageRank conserves mass and is partition-invariant") {
    import graft.operators.PageRank
    val e = PageRank.tradeEdgesWeighted(spark, sf)
    val r1 = PageRank.runWeighted(e, "cust", "supp", "w", iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(2))).sortBy(_._1)
    val r2 = PageRank.runWeighted(e.repartition(5), "cust", "supp", "w", iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(2))).sortBy(_._1)
    assert(r1.sameElements(r2))
    val total = r1.map(_._2).sum
    assert(total <= PageRank.Scale && total >= (PageRank.Scale * 9) / 10)
  }

  test("q301 incremental aggregate equals a direct recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
    val direct = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("source"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 11 === 0).select("source", "text"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("total_len"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val incr = SparkEntry.queries("q301_incremental_agg")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(incr.sameElements(direct))
  }

  test("path trigram totals: one per event beyond each user's first two") {
    val total = SparkEntry.queries("q303_path_ngrams")(spark, sf)
      .agg(sum("n")).head().getLong(0)
    val perUser = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => math.max(0L, r.getLong(1) - 2)).sum
    // top-20 can only undercount the full trigram population
    assert(total <= perUser)
    val all = Tables.events(spark, sf).count()
    assert(perUser > 0 && perUser < all)
  }

  test("q305 estimated jaccard is a [0,1] sketch of q299's exact value") {
    val rows = SparkEntry.queries("q305_source_minhash")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    val exact = SparkEntry.queries("q299_source_overlap")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(rows.keySet == exact.keySet)
    rows.foreach { case (k, (est, ex)) =>
      assert(est >= 0.0 && est <= 1.0)
      assert(ex == exact(k), s"$k exact mismatch")
      // 16 slots give ±1/4-ish resolution; just pin the gross bound
      assert(math.abs(est - ex) <= 0.5, s"$k est $est vs exact $ex")
    }
  }
}
