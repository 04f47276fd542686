package graft

import org.apache.spark.sql.functions._
import graft.text.{Fingerprint, Redact}
import graft.multimodal.Multimodal

/** Round-5 operators: winnowed fingerprinting, PII redaction,
  * embedding near-dup dedup, frame sampling.
  */
class Round5Spec extends SparkSpec {

  /** Plain-Scala winnowing oracle: md5-top-16-hex per 8-gram, min per
    * 4-window, distinct.
    */
  private def bruteFps(text: String, k: Int = 8, w: Int = 4): Set[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val grams = (0 to text.length - k).map(i => h(text.substring(i, i + k)))
    (0 to grams.length - w).map(i => grams.slice(i, i + w).min).toSet
  }

  test("fingerprints match a plain-Scala winnowing fold per document") {
    val docs = Tables.documents(spark, sf).limit(20).cache()
    val got = Fingerprint.fingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, t) =>
      val fps = bruteFps(t)
      val (nGrams, nFps, minFp, maxFp) = got(id)
      assert(nGrams == t.length - 7, s"doc $id gram count")
      assert(nFps == fps.size, s"doc $id fp count")
      assert(minFp == fps.min && maxFp == fps.max, s"doc $id fp bounds")
    }
  }

  test("native WinnowSet path equals the composed explode+window pipeline") {
    val docs = Tables.documents(spark, sf).cache()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))
    val native = Fingerprint.fingerprintsNative(docs, "doc_id", "text")
      .collect().map(key).toSet
    val composed = Fingerprint.fingerprints(docs, "doc_id", "text")
      .collect().map(key).toSet
    assert(native === composed)
    assert(native.nonEmpty)
    // full fingerprint SETS too (not just the summary stats)
    val sets = docs.limit(30)
      .select(col("doc_id"), Fingerprint.winnowSet(col("text"), 8, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    docs.limit(30).select("doc_id", "text").collect().foreach { r =>
      assert(sets(r.getLong(0)) === bruteFps(r.getString(1)), s"doc ${r.getLong(0)}")
    }
  }

  test("WinnowSet matches brute force on random strings (property)") {
    import spark.implicits._
    // deterministic pseudo-random strings incl. repeats, short docs, and
    // a tiny alphabet (forces hash ties, the deque's equal-value path)
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "abc xyz", "abcdefghij klmnop qrstuv")
    val texts = (0 until 120).map { i =>
      val a = alphabets(i % alphabets.size)
      val len = rnd.nextInt(40) // 0..39, many below the k+w-1=11 floor
      (i.toLong, (0 until len).map(_ => a(rnd.nextInt(a.length))).mkString)
    }
    val df = texts.toDF("id", "t")
    val got = df.select(col("id"), Fingerprint.winnowSet(col("t"), 8, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    texts.foreach { case (id, t) =>
      val want = if (t.length < 11) Set.empty[String] else bruteFps(t)
      assert(got(id) === want, s"id=$id len=${t.length} text='$t'")
    }
  }

  test("redaction replaces every e-mail and phone and counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "write bob.smith@corp.example.org or +1-555-0199 today"),
      (2L, "no pii here at all"),
      (3L, "a@b.io then c.d@e-f.co.uk and +1-555-1234 +1-555-9999"))
      .toDF("id", "t")
      .select(col("id"), Redact.pii(col("t")).as("r"),
        Redact.emailCount(col("t")).as("ne"), Redact.phoneCount(col("t")).as("np"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L) == (("write <EMAIL> or <PHONE> today", 1L, 1L)))
    assert(rows(2L) == (("no pii here at all", 0L, 0L)))
    assert(rows(3L)._2 == 2L && rows(3L)._3 == 2L)
    assert(!rows(3L)._1.contains("@") && !rows(3L)._1.contains("+1-555-"))
  }

  test("embed dedup keeps exactly one representative per cluster") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = graft.similarity.Similarity.cosinePairsTiled(emb, 0.4)
      .localCheckpoint(true)
    val comp = graft.operators.Components.connected(pairs, "id1", "id2")
    val out = emb.select(col("vec_id"))
      .join(comp.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("rep"), col("vec_id")).as("rep"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val total = out.length
    assert(total == emb.count())
    // every cluster's representative is its min member and is kept
    out.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.map(_._1).min == rep, s"cluster $rep min-rep")
    }
    // edges connect only same-cluster nodes
    val repOf = out.toMap
    pairs.select("id1", "id2").collect().foreach { r =>
      assert(repOf(r.getLong(0)) == repOf(r.getLong(1)), "edge within cluster")
    }
  }

  test("KMV sketch estimate is within the k=64 error envelope; exact under k") {
    import spark.implicits._
    val k = 64
    // synthetic groups: one far above k distinct, one far below
    val df = ((0 until 5000).map(i => ("big", i.toLong)) ++
      (0 until 20).map(i => ("small", i.toLong))).toDF("g", "v")
    val hashed = df.select(col("g"),
      substring(md5(concat(lit("kmv:"), col("v").cast("string"))), 1, 12).as("h")).distinct()
    val kmin = graft.plans.GroupTopK.topKPerKey(hashed, Seq("g"), Seq(("h", false)), k)
    val est = kmin.groupBy("g")
      .agg(count(lit(1)).as("n_h"), max(col("h")).as("mx"))
      .withColumn("est",
        when(col("n_h") < k, col("n_h").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (conv(col("mx"), 16, 10).cast("double") / math.pow(16.0, 12))))
      .collect().map(r => r.getString(0) -> r.getDouble(r.fieldIndex("est"))).toMap
    assert(est("small") === 20.0) // below k → exact
    val rel = math.abs(est("big") - 5000.0) / 5000.0
    assert(rel < 0.35, s"relative error $rel (est ${est("big")})")
  }

  test("KmvAgg mergeable aggregator equals the distinct+GroupTopK pipeline") {
    import spark.implicits._
    val k = 64
    val df = ((0 until 5000).map(i => ("big", i.toLong)) ++
      (0 until 20).map(i => ("small", i.toLong)) ++
      (0 until 5000).map(i => ("big", i.toLong))) // duplicates on purpose
      .toDF("g", "v")
      .repartition(8) // force multi-partition partial sketches + merge
    val hashed = df.select(col("g"),
      substring(md5(concat(lit("kmv:"), col("v").cast("string"))), 1, 12).as("h"))
    val viaAgg = hashed.groupBy("g")
      .agg(graft.functions.KmvAgg.kmv(col("h"), k).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val kmin = graft.plans.GroupTopK.topKPerKey(
      hashed.distinct(), Seq("g"), Seq(("h", false)), k)
    val viaPipeline = kmin.groupBy("g")
      .agg(count(lit(1)).as("n_h"), max(col("h")).as("mx"))
      .withColumn("est",
        when(col("n_h") < k, col("n_h").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (conv(col("mx"), 16, 10).cast("double") / math.pow(16.0, 12))))
      .collect().map(r => r.getString(0) -> r.getDouble(r.fieldIndex("est"))).toMap
    assert(viaAgg.keySet === viaPipeline.keySet)
    viaAgg.foreach { case (g, e) =>
      assert(math.abs(e - viaPipeline(g)) < 1e-9, s"group $g: $e vs ${viaPipeline(g)}")
    }
    assert(viaAgg("small") === 20.0)
  }

  test("sampled frames reassemble byte-exactly into the payload") {
    val bt = Multimodal.asBinaryTable(
      Tables.documents(spark, sf).limit(10), "text")
    bt.select(col("payload"),
        Multimodal.sampleFrames(col("payload"), 7).as("frames"))
      .collect().foreach { r =>
        val payload = r.getAs[Array[Byte]](0)
        val frames = r.getSeq[Array[Byte]](1)
        assert(frames.forall(_.length <= 7))
        assert(java.util.Arrays.equals(frames.flatten.toArray, payload))
      }
  }
}
