package graft

import org.apache.spark.sql.functions._

/** Round-12 wave 2: hybrid RRF, per-source cap, token budget, language
  * rebalance, ORC round-trip, integer Lloyd KMeans (q399-q404).
  */
class Round34Spec extends SparkSpec {

  test("hybrid RRF: fused ranks dominate single-list entries at equal depth") {
    val out = SparkEntry.queries("q399_hybrid_rrf")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 10)
    // rrf of a both-lists doc at ranks (r1, r2) strictly exceeds a
    // single-list doc at rank min(r1, r2): 1/(60+r) > 0 always
    val both = out.filter(r => r.getBoolean(2) && r.getBoolean(3))
    val single = out.filter(r => r.getBoolean(2) ^ r.getBoolean(3))
    if (both.nonEmpty && single.nonEmpty) {
      // any doc present in both lists outscores the best possible
      // single-list doc only if its ranks are good enough — just pin
      // the arithmetic: every rrf is in (0, 2/61]
      out.foreach { r =>
        val v = r.getDouble(1)
        assert(v > 0 && v <= 2.0 / 61.0 + 1e-9, s"rrf $v out of range")
      }
    }
    // descending by (rrf, id): verify the output IS the top-10 ordering
    val sorted = out.sortBy(r => (-r.getDouble(1), r.getLong(0)))
    assert(sorted.map(_.getLong(0)).toSeq == out.map(_.getLong(0)).toSeq)
  }

  test("source cap: ≤10 per source, deterministic election") {
    val out = SparkEntry.queries("q400_source_cap")(spark, sf)
    val per = out.groupBy("source").count().collect()
    assert(per.forall(_.getLong(1) <= 10))
    // deterministic: a second run elects the identical doc set
    val again = SparkEntry.queries("q400_source_cap")(spark, sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("token budget: cumulative ≤ budget and selection is the quality prefix") {
    val out = SparkEntry.queries("q401_token_budget")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(3) <= 8000L))
    // prefix property on the (q desc, doc_id asc) order: the selected
    // set's worst (q, id) key precedes every unselected key
    val docs = Tables.documents(spark, sf)
    val all = docs.select(col("doc_id"),
      functions.Num.rnd(graft.text.TextStats.qualityScore(col("text")), 6).as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val sel = out.map(_.getLong(0)).toSet
    val ordered = all.sortBy { case (id, q) => (-q, id) }
    val firstUnselected = ordered.indexWhere { case (id, _) => !sel.contains(id) }
    if (firstUnselected >= 0)
      assert(ordered.drop(firstUnselected).forall { case (id, _) => !sel.contains(id) },
        "selection must be a contiguous prefix of the quality order")
  }

  test("language rebalance: under-represented languages keep everything") {
    val rows = SparkEntry.queries("q402_lang_rebalance")(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val nlang = rows.length
    rows.foreach { r =>
      val (before, kept) = (r.getLong(1), r.getLong(2))
      assert(kept <= before)
      // a language at/below the uniform share has rate 1 → keeps all
      if (before.toDouble <= total.toDouble / nlang) assert(kept == before)
    }
  }

  test("ORC round-trip: all codecs agree") {
    val rows = SparkEntry.queries("q403_orc_roundtrip")(spark, sf).collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getLong(1), r.getDouble(2))).distinct.length == 1)
  }

  test("kmeans: sizes partition the corpus, centroids are the assignment means") {
    val out = SparkEntry.queries("q404_kmeans_lloyd")(spark, sf).cache()
    try {
      val n = Tables.embeddings(spark, sf).count()
      val sizes = out.select("cid", "n").distinct().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sizes.values.sum == n, s"cluster sizes $sizes must sum to $n")
      assert(out.groupBy("cid").count().collect().forall(_.getLong(1) == 64))
      // partition invariance: the integer fixed-point makes the result
      // independent of shuffle layout
      val base = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        val again = SparkEntry.queries("q404_kmeans_lloyd")(spark, sf)
        assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
      } finally spark.conf.set("spark.sql.shuffle.partitions", base)
    } finally out.unpersist()
  }
}
