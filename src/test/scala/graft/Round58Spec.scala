package graft

import org.apache.spark.sql.functions._

/** Round-13 wave 1: file-sink gram probe twin, Naive-Bayes language
  * model, cluster-capped sampling, n-gram novelty (q436-q439), plus the
  * q427/q428 bucketed-rank scale fix invariants.
  */
class Round58Spec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q436 file-sink gram probe ≡ memory-sink twin (q433)") {
    val files = graft.streaming.DocStreams.gramIndexProbeStreamToFiles(spark, sf, 8)
    val mem = graft.streaming.DocStreams.gramIndexProbeStream(spark, sf, 8)
    assert(files.exceptAll(mem).isEmpty && mem.exceptAll(files).isEmpty)
  }

  test("q437 NB confusion matrix conserves the held-out split") {
    val docs = Tables.documents(spark, sf)
    val test0 = docs.filter(col("doc_id") % 10 === 0)
    val cm = run("q437_naive_bayes_lang")
    assert(cm.agg(sum("n_docs")).collect()(0).getLong(0) === test0.count())
    val trainLangs = docs.filter(col("doc_id") % 10 =!= 0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(cm.select("pred_lang").distinct().collect()
      .map(_.getString(0)).forall(trainLangs))
  }

  test("NaiveBayes separates class-indicative tokens (constructed corpus)") {
    import spark.implicits._
    val train = Seq(
      (1L, "aa aa bb", "A"), (2L, "aa cc", "A"), (3L, "aa bb", "A"),
      (4L, "zz zz yy", "B"), (5L, "zz xx", "B")).toDF("doc_id", "text", "lang")
    val probe = Seq((10L, "aa bb aa"), (11L, "zz yy"), (12L, "qq"))
      .toDF("doc_id", "text")
    val pred = graft.text.NaiveBayes
      .predict(train, probe, "text", "lang", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(10L) == "A" && pred(11L) == "B")
    // all-OOV doc: smoothed likelihoods ln(1/(N_c+V)) favor the smaller
    // class B, but the prior ln(3/5) vs ln(2/5) outweighs it → A
    assert(pred(12L) == "A")
  }

  test("q438 cluster cap: exactly min(CAP, |cell|) kept per cell") {
    val out = run("q438_cluster_cap")
    val perCell = out.groupBy("cell").agg(
      count(lit(1)).as("n"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("k")).collect()
    perCell.foreach { r =>
      assert(r.getLong(2) === math.min(8L, r.getLong(1)),
        s"cell ${r.get(0)}: ${r.getLong(2)} kept of ${r.getLong(1)}")
    }
    assert(out.count() === Tables.embeddings(spark, sf).count())
  }

  test("q439 novelty bounds and split coverage") {
    val out = run("q439_ngram_novelty").collect()
    out.foreach { r =>
      val (n, nov, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nov >= 0 && nov <= n && f >= 0.0 && f <= 1.0)
    }
    // every held-out doc with ≥3 tokens is scored
    val eligible = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0)
      .filter(size(filter(split(col("text"), " "), t => t =!= "")) >= 3)
      .count()
    assert(out.length.toLong === eligible)
  }

  test("q427 epoch rank is a permutation of 1..n per epoch") {
    val out = run("q427_epoch_shuffle")
    val n = Tables.documents(spark, sf).count()
    val perEpoch = out.groupBy("epoch").agg(
      count(lit(1)).as("c"), min("rk").as("lo"), max("rk").as("hi"),
      countDistinct("rk").as("d")).collect()
    assert(perEpoch.length === 3)
    perEpoch.foreach { r =>
      assert(r.getLong(1) === n && r.getLong(2) === 1L &&
        r.getLong(3) === n && r.getLong(4) === n)
    }
  }

  test("q428 interleave: global pos is a permutation, per-source rn dense") {
    val out = run("q428_source_interleave").cache()
    try {
      val n = out.count()
      val g = out.agg(min("pos"), max("pos"), countDistinct("pos")).collect()(0)
      assert(g.getLong(0) === 1L && g.getLong(1) === n && g.getLong(2) === n)
      out.groupBy("source").agg(count(lit(1)).as("c"), min("rn").as("lo"),
          max("rn").as("hi"), countDistinct("rn").as("d")).collect()
        .foreach { r =>
          assert(r.getLong(2) === 1L && r.getLong(3) === r.getLong(1) &&
            r.getLong(4) === r.getLong(1), s"source ${r.getString(0)}")
        }
      // round-robin property: the first |sources| positions are distinct sources
      val nSrc = out.select("source").distinct().count()
      val firstRound = out.filter(col("pos") <= nSrc)
        .select("source").distinct().count()
      assert(firstRound === nSrc)
    } finally out.unpersist()
  }
}
