package graft

import org.apache.spark.sql.functions._

/** Round-13 wave 2: persisted NB model, Matryoshka recall, CDC upsert
  * (q440-q442).
  */
class Round59Spec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q440 prefit ≡ refit: persisted model round-trip changes nothing") {
    val docs = Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val test0 = docs.filter(col("doc_id") % 10 === 0)
    val direct = graft.text.NaiveBayes
      .confusion(train, test0, "text", "lang", "doc_id")
    val path = graft.tools.Staging.dir("nb_model_spec", sf)
    graft.text.NaiveBayes.fitModel(train, "text", "lang")
      .write.mode("overwrite").parquet(path)
    val prefit = graft.text.NaiveBayes.confusionFromModel(
      spark.read.parquet(path), test0, "text", "lang", "doc_id")
    assert(direct.exceptAll(prefit).isEmpty && prefit.exceptAll(direct).isEmpty)
  }

  test("q441 recall bounds; full-vs-full truth recalls 1.0") {
    val out = run("q441_matryoshka_recall").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) === 5L)
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 5L)
      val rec = r.getDouble(3)
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // degenerate check: "truncating" to all 64 dims must recall 1.0
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 4)
    val a = graft.similarity.Similarity.bruteForceTopK(q, e, 5)
      .select("qid", "vid")
    val b = graft.similarity.Similarity.bruteForceTopK(
        q.select(col("vec_id"), slice(col("embedding"), 1, 64).as("embedding")),
        e.select(col("vec_id"), slice(col("embedding"), 1, 64).as("embedding")), 5)
      .select("qid", "vid")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q443 streaming upsert ≡ batch merge, across MULTIPLE microbatches") {
    val streamed = graft.streaming.DocStreams.cdcUpsertStream(spark, sf)
    val batch = run("q442_cdc_upsert")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // the copy-on-write loop really versioned more than once
    val versions = new java.io.File(graft.tools.Staging.dir("cdc_table", sf))
      .listFiles().count(f => f.getName.matches("v\\d+"))
    assert(versions >= 3, s"expected multi-batch merge, saw $versions versions")
  }

  test("q442 upsert mass accounting: base − deletes + inserts; ops applied") {
    val docs = Tables.documents(spark, sf)
    val nBase = docs.count()
    val nDel = docs.filter(col("doc_id") % 30 === 0).count()
    val nIns = docs.filter(col("doc_id") % 30 === 20).count()
    val out = run("q442_cdc_upsert").cache()
    try {
      assert(out.count() === nBase - nDel + nIns)
      // deletes gone
      assert(out.join(docs.filter(col("doc_id") % 30 === 0)
        .select("doc_id"), "doc_id").count() === 0L)
      // inserts present under shifted ids
      assert(out.filter(col("doc_id") >= 10000000L).count() === nIns)
      // updates changed the text hash
      val upd = docs.filter(col("doc_id") % 30 === 10)
        .select(col("doc_id"), md5(col("text")).as("old_md5"))
      assert(out.join(upd, "doc_id")
        .filter(col("text_md5") === col("old_md5")).count() === 0L)
    } finally out.unpersist()
  }
}
