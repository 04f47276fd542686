package graft

import org.apache.spark.sql.functions._

/** Round-13 wave 4: streaming NB classification + PSI drift
  * (q446-q447).
  */
class Round61Spec extends SparkSpec {

  test("frozen kernel classify ≡ DataFrame predict (grid-long ≡ decimal)") {
    import graft.text.NaiveBayes
    val docs = Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val test0 = docs.filter(col("doc_id") % 10 === 0)
    val model = NaiveBayes.fitModel(train, "text", "lang")
    val frozen = NaiveBayes.freeze(model)
    val kernel = test0.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> NaiveBayes.classify(frozen, r.getString(1)))
      .toMap
    val df = NaiveBayes.predictFromModel(model, test0, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kernel == df)
  }

  test("q446 stream confusion ≡ batch q437") {
    val stream = SparkEntry.queries("q446_stream_nb_classify")(spark, sf)
    val batch = SparkEntry.queries("q437_naive_bayes_lang")(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("q447 PSI: zero drift on identical snapshots; nonnegative here") {
    import graft.operators.CdcUpsert
    val out = SparkEntry.queries("q447_psi_drift")(spark, sf).collect()
    assert(out.nonEmpty)
    // PSI is a sum of (p−q)ln(p/q) terms, each ≥ 0 before rounding, so
    // the 6dp-rounded sum can dip below 0 by at most #buckets·5e-7
    out.foreach(r => assert(r.getDouble(1) >= -4e-6, r.toString))
    // identical snapshots → every term is exactly 0
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
    val same = CdcUpsert.deriveChanges(docs, docs)
    assert(same.isEmpty) // sanity reuse: no drift input at all
  }
}
