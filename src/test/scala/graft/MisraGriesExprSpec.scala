package graft

import org.apache.spark.sql.functions._

import graft.functions.{MisraGries, MisraGriesExpr}

/** Native MisraGriesExpr ≡ the boxed udaf twin, plus the MG frequency
  * guarantee on a known skew.
  */
class MisraGriesExprSpec extends SparkSpec {
  import spark.implicits._

  test("single partition: native candidate set == udaf twin exactly") {
    // deterministic skewed stream: token i appears ~1000/i times
    val items = (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"tok$i"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(items.map(Tuple1(_)), 1).map(t =>
        org.apache.spark.sql.Row(t._1)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType))))
    for (k <- Seq(4, 16, 64)) {
      val nat = df.agg(MisraGriesExpr(k)(col("item"))).collect()(0)
        .getSeq[String](0).toSeq
      val twin = df.agg(MisraGries.mgUdaf(k)(col("item"))).collect()(0)
        .getSeq[String](0).toSeq
      assert(nat == twin, s"k=$k")
    }
  }

  test("multi-partition: the MG guarantee holds (heavy items survive)") {
    // 7 partitions, arbitrary merge order: every item with frequency
    // > N/(k+1) MUST be in the candidate set
    val items = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"t$i"))
    val n = items.size
    val df = items.toDF("item").repartition(7)
    val k = 16
    val cand = df.agg(MisraGriesExpr(k)(col("item"))).collect()(0)
      .getSeq[String](0).toSet
    val freq = items.groupBy(identity).view.mapValues(_.size)
    val heavy = freq.filter(_._2 > n.toDouble / (k + 1)).keys.toSet
    assert(heavy.subsetOf(cand),
      s"missing heavy hitters: ${heavy.diff(cand)}")
    assert(cand.size <= k)
  }

  test("nulls are skipped; empty input yields empty candidates") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("item")
    val cand = df.agg(MisraGriesExpr(4)(col("item"))).collect()(0)
      .getSeq[String](0).toSeq
    assert(cand == Seq("a", "b"))
    val empty = df.filter(col("item") === "zzz")
      .agg(MisraGriesExpr(4)(col("item"))).collect()(0).getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("MisraGriesTextExpr ≡ MisraGriesExpr over exploded tokens (1 partition) + total") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").coalesce(1)
    for (k <- Seq(8, 64, 512)) {
      val fused = docs.agg(graft.functions.MisraGriesTextExpr(k)(col("text")).as("s"))
        .select(col("s.cand"), col("s.n")).collect()(0)
      val words = docs.select(explode(
        graft.text.TextStats.tokensNonEmpty(col("text"))).as("word"))
      val twin = words.agg(MisraGriesExpr(k)(col("word")).as("cand"),
        count(col("word")).as("n")).collect()(0)
      assert(fused.getSeq[String](0) == twin.getSeq[String](0), s"k=$k candidates")
      assert(fused.getLong(1) == twin.getLong(1), s"k=$k total")
    }
  }

  test("CandTokenCountsExpr ≡ isin-filtered exact counts + current total") {
    val docs = Tables.documents(spark, sf).select("text")
    val cand = Seq("the", "a", "spark", "join", "zzz_absent")
    val arr = docs.agg(graft.functions.CandTokenCountsExpr(cand)(col("text")))
      .collect()(0).getSeq[Long](0)
    val words = docs.select(explode(
      graft.text.TextStats.tokensNonEmpty(col("text"))).as("word"))
    val exact = words.groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    cand.zipWithIndex.foreach { case (w, i) =>
      assert(arr(i) == exact.getOrElse(w, 0L), s"count($w)")
    }
    assert(arr.last == words.count(), "total")
  }

  test("topKFrequentText ≡ topKFrequent (certified and shrunk-fallback paths)") {
    val docs = Tables.documents(spark, sf)
    val words = docs.select(explode(
      graft.text.TextStats.tokensNonEmpty(col("text"))).as("word"))
    val a = graft.functions.MisraGries.topKFrequentText(docs, "text", 10, 512)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = graft.functions.MisraGries.topKFrequent(words, "word", 10, 512)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b)
    // uncertifiable sketch (flat vocab, tiny k) must fall back to exact
    val c = graft.functions.MisraGries.topKFrequentText(docs, "text", 10, 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(c == b)
    // shrunk corpus vs sketch: prefit on full, probe on half → exact fallback
    val sk = graft.functions.MisraGries.fitSketchText(docs, "text", 512)
    val half = docs.filter(col("doc_id") % 2 === 0)
    val d = graft.functions.MisraGries.topKFrequentPrefitText(half, "text", 10, sk)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val halfWords = half.select(explode(
      graft.text.TextStats.tokensNonEmpty(col("text"))).as("word"))
    val e = graft.functions.MisraGries.topKFrequent(halfWords, "word", 10, 512)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(d == e)
  }

  test("persisted q232 sketch is invalidated when the corpus changes on disk") {
    // r14 (VERDICT r13 item 6): the staging path embeds the source
    // file's modTime, so an in-place corpus rewrite can never silently
    // reuse a stale sketch.
    import spark.implicits._
    val sfDir = java.nio.file.Files.createTempDirectory("mg_stale").toString
    def writeCorpus(word: String): Unit =
      Seq.tabulate(20)(i => (i.toLong, s"$word filler$i", "src0", 10L))
        .toDF("doc_id", "text", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$sfDir/documents.parquet")
    def topWord(): String = {
      val q = SparkEntry.queries("q232_heavy_hitters")(spark, sfDir)
      q.orderBy(col("cnt").desc, col("word")).limit(1).collect()(0).getString(0)
    }
    writeCorpus("alpha")
    val path1 = graft.tools.Staging.dirKeyedOnSource(spark, "mg_sketch_q232", sfDir, "documents")
    assert(topWord() == "alpha")
    Thread.sleep(1100) // ensure a distinct file modTime even on 1s-granular filesystems
    writeCorpus("omega")
    // the staging path itself must move — that is the invalidation
    val path2 = graft.tools.Staging.dirKeyedOnSource(spark, "mg_sketch_q232", sfDir, "documents")
    assert(path1 != path2, "modTime key did not change with the corpus")
    // and end-to-end: a stale fs.exists-guarded sketch would feed "alpha"
    // candidates; the fresh fit sees only "omega"
    assert(topWord() == "omega")
  }
}
