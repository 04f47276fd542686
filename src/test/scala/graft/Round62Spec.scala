package graft

import org.apache.spark.sql.functions._

/** Round-13 wave 5: rejection audit + temperature-weighted sampler
  * (q448-q449).
  */
class Round62Spec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q448 audit conserves the corpus and first-rule-wins holds") {
    val docs = Tables.documents(spark, sf)
    val out = run("q448_reject_audit")
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0) === docs.count())
    // a too-short non-allowed-lang doc must land on too_short, never
    // lang_filtered: rebuild reasons independently and cross-check
    val toks = filter(split(col("text"), " "), x => x =!= "")
    val both = docs.filter(size(toks) < 10 && !col("lang").isin("en", "fr", "es"))
    if (both.count() > 0) {
      val perDoc = docs.select(col("doc_id"),
        when(size(toks) < 10, "too_short").otherwise("other").as("r1"))
      assert(both.join(perDoc, "doc_id")
        .filter(col("r1") =!= "too_short").count() === 0)
    }
  }

  test("q449 sampler: every position filled; sources follow the weights") {
    val out = run("q449_temperature_sampler").cache()
    try {
      val n = Tables.documents(spark, sf).count()
      assert(out.count() === n)
      assert(out.select("p").distinct().count() === n)
      // every emitted doc belongs to its claimed source
      val docs = Tables.documents(spark, sf).select(
        col("doc_id"), col("source").as("true_source"))
      assert(out.join(docs, "doc_id")
        .filter(col("source") =!= col("true_source")).count() === 0)
      // temperature flattens DETERMINISTICALLY in the weight table
      // (the sampled realization at 50 docs is too noisy to bound):
      // w_s/z vs corpus share — α=0.5 damps the biggest source below
      // its corpus share and lifts the smallest above it
      val counts = Tables.documents(spark, sf).groupBy("source")
        .agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val z = counts.map(c => math.sqrt(c._2.toDouble)).sum
      val shares = counts.map { case (src, c) =>
        (src, math.sqrt(c.toDouble) / z, c.toDouble / n) }
      val biggest = shares.maxBy(_._3)
      val smallest = shares.minBy(_._3)
      assert(biggest._2 <= biggest._3 && smallest._2 >= smallest._3)
      if (biggest._3 > smallest._3) // strict only when counts differ
        assert(biggest._2 < biggest._3 && smallest._2 > smallest._3)
      // and the sampled counts are within 4σ of the weight shares
      val sampled = out.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      shares.foreach { case (src, w, _) =>
        val exp = w * n
        val sd = math.sqrt(n * w * (1 - w))
        val got = sampled.getOrElse(src, 0L).toDouble
        assert(math.abs(got - exp) <= 4 * sd + 1,
          s"$src sampled $got expected $exp (sd $sd)")
      }
    } finally out.unpersist()
  }

  test("q449 within-source consumption order is the md5 doc order, wrapped") {
    val out = run("q449_temperature_sampler")
    // for each source, the docs at its first two positions must be the
    // source's rank-1 and rank-2 docs in md5 order
    val docs = Tables.documents(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(md5(col("doc_id").cast("string")))
    val firstTwo = docs.select(col("source"), col("doc_id"),
        row_number().over(w).as("dr")).filter(col("dr") <= 2)
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("p")
    val sampledFirstTwo = out.select(col("source"), col("doc_id"),
        row_number().over(wp).as("sr")).filter(col("sr") <= 2)
    val joined = sampledFirstTwo.join(firstTwo,
      Seq("source", "doc_id"), "inner")
    assert(joined.filter(col("sr") === col("dr")).count() ===
      sampledFirstTwo.count())
  }
}
