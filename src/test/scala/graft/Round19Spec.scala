package graft

import org.apache.spark.sql.functions._

class Round19Spec extends SparkSpec {

  test("curriculum split: buckets cover all docs and are roughly balanced") {
    val r = SparkEntry.queries("q285_curriculum_split")(spark, sf)
    val counts = r.groupBy("bucket").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == Tables.documents(spark, sf).count())
    assert(counts.keySet == Set("head", "middle", "tail"))
    // exact-percentile cuts put ~1/3 per bucket (ties can skew a little)
    counts.values.foreach(c => assert(c > total / 5 && c < total / 2, counts))
  }

  test("hopping window: every event lands in exactly two windows") {
    val r = SparkEntry.queries("q286_hopping_window")(spark, sf)
    val rows = r.agg(sum("n")).head().getLong(0)
    assert(rows == 2 * Tables.events(spark, sf).count())
    // consecutive window starts are 30 minutes apart
    val starts = r.select("ws").distinct().collect().map(_.getLong(0)).sorted
    starts.sliding(2).foreach { case Array(a, b) => assert((b - a) % 1800 == 0) }
  }

  test("MMR picks the most relevant first and is more diverse than pure top-k") {
    import graft.similarity.Mmr
    val emb = Tables.embeddings(spark, sf)
    val mmr = SparkEntry.queries("q287_mmr_diversity")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(mmr.length == 8 && mmr.map(_._3).sorted.sameElements(1L to 8L))
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // rank 1 = argmax relevance (tie min id) — λ·rel with empty penalty
    val maxRel = mmr.map(_._2).max
    assert(mmr.find(_._3 == 1L).get._2 == maxRel)
    def avgPairSim(ids: Seq[Long]): Double = {
      val ps = for (a <- ids; b <- ids if a < b) yield Mmr.cosD(vecs(a), vecs(b))
      ps.sum / ps.length
    }
    val pureTop = graft.similarity.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") === 0L), emb, 8)
      .select("vid").collect().map(_.getLong(0)).toSeq
    assert(avgPairSim(mmr.map(_._1).toSeq) <= avgPairSim(pureTop) + 1e-12,
      "MMR set should not be less diverse than the pure-relevance set")
  }

  test("group-wise OLS recovers an exact line and a flat series") {
    import spark.implicits._
    import graft.functions.Num
    // replicate the q288 moment pipeline on a constructed frame:
    // y = 3 + 2t for group a (exact), y = 7 for group b (slope 0)
    val df = ((0 until 50).map(t => ("a", t.toLong, 3.0 + 2.0 * t)) ++
      (0 until 50).map(t => ("b", t.toLong, 7.0))).toDF("g", "tm", "v")
    val m = df.select(col("g"), col("tm").cast("decimal(18,0)").as("tm"),
        Num.rnd(col("v"), 6).cast("decimal(18,6)").as("vr"))
      .groupBy("g")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("tm")).cast("double").as("st"),
        sum(col("vr")).cast("double").as("sv"),
        sum(col("tm") * col("vr")).cast("double").as("stv"),
        sum(col("tm") * col("tm")).cast("double").as("stt"))
      .select(col("g"),
        ((col("n") * col("stv") - col("st") * col("sv"))
          / (col("n") * col("stt") - col("st") * col("st"))).as("slope"),
        ((col("sv") - (col("n") * col("stv") - col("st") * col("sv"))
          / (col("n") * col("stt") - col("st") * col("st")) * col("st")) / col("n")).as("b"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(m("a")._1 - 2.0) < 1e-9 && math.abs(m("a")._2 - 3.0) < 1e-9)
    assert(math.abs(m("b")._1) < 1e-12 && math.abs(m("b")._2 - 7.0) < 1e-9)
  }

  test("cube emits all four grouping-set shapes") {
    val r = SparkEntry.queries("q284_cube")(spark, sf).collect()
    def isAll(s: String) = s == "__all__"
    val shapes = r.map(x => (isAll(x.getString(0)), isAll(x.getString(1)))).distinct
    assert(shapes.length == 4)
    // grand total row equals the corpus size
    val grand = r.filter(x => isAll(x.getString(0)) && isAll(x.getString(1)))
    assert(grand.length == 1 &&
      grand.head.getLong(2) == Tables.documents(spark, sf).count())
  }
}
