package graft

import org.apache.spark.sql.functions._

import graft.text.{Bpe, BpeMerges, Decontaminate, Shingles}

/** Round-10 surface: decontamination and the column-carrying BPE
  * kernel.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "train"),
    (1L, "pack my box with five dozen liquor jugs", "train"),
    (2L, "a quick brown fox jumps over everything else", "train"), // shares 4-gram
    (3L, "too short", "train"), // < n tokens: no grams at all
    (4L, "the quick brown fox sleeps", "train"), // shares exactly one 4-gram
    (5L, "completely disjoint sentence with unique words here", "train")
  ).toDF("doc_id", "text", "split")

  private def evalSet = Seq(
    (100L, "the quick brown fox jumps over the fence"),
    (101L, "an unrelated benchmark prompt")
  ).toDF("eval_id", "text")

  test("Decontaminate.flag matches the brute-force overlap (bloom FPs killed)") {
    val got = Decontaminate.flag(corpus, "doc_id", "text", evalSet, "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    // brute force: distinct-gram intersection per doc, no bloom
    val ev = evalSet.select(explode(Shingles.shingles(col("text"), 4)).as("g"))
      .distinct().as[String].collect().toSet
    val expect = corpus.select(col("doc_id"), Shingles.shingles(col("text"), 4).as("s"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, s) =>
        val h = s.count(ev.contains)
        (id, h.toLong, h > 0)
      }.sortBy(_._1)
    assert(got.toSeq === expect.toSeq)
    // the fixture exercises both outcomes and the one-gram boundary
    assert(got.count(_._3) >= 2 && got.exists(!_._3))
    assert(got.find(_._1 == 4L).get._2 === 1L)
    assert(got.find(_._1 == 3L).get._2 === 0L)
  }

  test("Decontaminate.clean keeps exactly the unflagged rows, all columns") {
    val flagged = Decontaminate.flag(corpus, "doc_id", "text", evalSet, "text", 4)
      .filter(col("contaminated")).select("doc_id").as[Long].collect().toSet
    val cleaned = Decontaminate.clean(corpus, "doc_id", "text", evalSet, "text", 4)
    assert(cleaned.columns.toSeq === corpus.columns.toSeq)
    val keptIds = cleaned.select("doc_id").as[Long].collect().toSet
    val allIds = corpus.select("doc_id").as[Long].collect().toSet
    assert(keptIds === (allIds -- flagged))
  }

  test("Bpe.encodeWith == encodeKernel with every input column carried") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
    val model = Bpe.Model(BpeMerges.pretrained)
    val carried = Bpe.encodeWith(docs, "text", model)
    assert(carried.columns.toSeq ===
      Seq("doc_id", "source", "text", "bpe_repr", "n_tok"))
    val viaKernel = Bpe.encodeKernel(docs, "doc_id", "text", model)
      .select("doc_id", "bpe_repr", "n_tok")
    val a = carried.select("doc_id", "bpe_repr", "n_tok")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val b = viaKernel
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // source column survives untouched
    val srcs = Bpe.encodeWith(docs, "text", model)
      .groupBy("source").count().count()
    assert(srcs === docs.select("source").distinct().count())
  }

  test("GFrame.dropNearDuplicates keeps exactly the q166 cluster representatives") {
    import graft.api.GFrame
    val docs = Tables.documents(spark, sf)
    val pairs = graft.text.MinHash.nearDuplicates(docs, "doc_id", "text", 3, 0.5)
    val losers = graft.operators.Components.connected(pairs, "id1", "id2")
      .filter(col("rep") =!= col("id")).select("id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    val kept = GFrame(docs).dropNearDuplicates("doc_id", "text")
      .df.select("doc_id").as[Long].collect().toSet
    assert(losers.nonEmpty) // fixture actually has near-dups
    assert(kept === (all -- losers))
    // all columns survive
    assert(GFrame(docs).dropNearDuplicates("doc_id", "text").df.columns.toSeq
      === docs.columns.toSeq)
  }

  test("GFrame.semDedup keeps exactly Similarity.semDedup's kept ids") {
    import graft.api.GFrame
    import graft.similarity.{IVF, IVFCentroids, Similarity}
    val emb = Tables.embeddings(spark, sf)
    val model = IVF.Model(IVFCentroids.pretrained)
    val expect = Similarity.semDedup(emb, model, 0.4)
      .filter(col("kept")).select("vec_id").as[Long].collect().toSet
    val got = GFrame(emb).semDedup(model, 0.4)
      .df.select("vec_id").as[Long].collect().toSet
    assert(got === expect)
    assert(expect.size < emb.count()) // some rows actually dropped
  }

  test("encodeWith handles null text as empty (one empty token per word rule)") {
    val df = Seq((1L, Option("ab ab")), (2L, Option.empty[String]))
      .toDF("id", "text")
    val out = Bpe.encodeWith(df, "text", Bpe.Model(Seq(("a", "b"))))
      .select("id", "bpe_repr", "n_tok")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(out(0) === ((1L, "(ab) (ab)", 2L)))
    assert(out(1) === ((2L, "", 0L)))
  }
}
