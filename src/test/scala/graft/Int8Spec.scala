package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Int8, Similarity}

/** int8 quantization invariants the oracle can't see: code range,
  * zero-variance handling, and search recall vs exact cosine.
  */
class Int8Spec extends SparkSpec {

  test("codes stay in [-127, 127] and arrays keep 64 dims") {
    val codes = Int8.quantize(Tables.embeddings(spark, sf))
    val r = codes.select(
      min(array_min(col("codes"))), max(array_max(col("codes"))),
      min(size(col("codes"))), max(size(col("codes")))).collect()(0)
    assert(r.getInt(0) >= -127 && r.getInt(1) <= 127)
    assert(r.getInt(2) == 64 && r.getInt(3) == 64)
  }

  test("a constant-zero dimension quantizes to code 0 (scale floor)") {
    import spark.implicits._
    val df = Seq((1L, Seq(0f, 1f)), (2L, Seq(0f, -1f)))
      .toDF("vec_id", "embedding")
    val codes = Int8.quantize(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(1L)(0) == 0 && codes(2L)(0) == 0)
    assert(codes(1L)(1) == 127 && codes(2L)(1) == -127)
  }

  test("re-quantizing the reconstruction moves every code at most 1 step") {
    // decode(q(x)) re-quantized: the reconstruction c·s is exact on the
    // ORIGINAL scale grid, but quantize 6dp-rounds its inputs and
    // re-derives scales, so a value sitting at a rounding boundary can
    // shift ONE code step — never more (stability bound, the property
    // that makes repeated encode/decode cycles safe).
    val em = Tables.embeddings(spark, sf).limit(500)
    val codes1 = Int8.quantize(em).cache()
    val sc = Int8.scales(em).collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val scArr = (0 until 64).map(sc(_))
    val recon = codes1.select(col("vec_id"),
      expr(s"transform(codes, (c, i) -> cast(cast(c as double) * " +
        s"element_at(array(${scArr.mkString(",")}), i + 1) as float))")
        .as("embedding"))
    val codes2 = Int8.quantize(recon)
    val joined = codes1.select(col("vec_id"), col("codes").as("c1"))
      .join(codes2.select(col("vec_id"), col("codes").as("c2")), Seq("vec_id"))
    val maxStep = joined.select(max(expr(
      "aggregate(zip_with(c1, c2, (a, b) -> abs(a - b)), 0, (m, d) -> greatest(m, d))"))
    ).collect()(0).getInt(0)
    assert(maxStep <= 1, s"re-quantization moved a code by $maxStep steps")
    assert(joined.count() == 500L)
    codes1.unpersist()
  }

  test("int8 top-k recall vs exact cosine top-k is high") {
    val em = Tables.embeddings(spark, sf)
    val codes = Int8.quantize(em).cache()
    val got = Int8.topK(codes.filter(col("vec_id") < 8), codes, 5)
      .select("qid", "vid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // exact float cosine reference
    val c = em.select(col("vec_id").as("vid"), col("embedding").as("cv"))
    val q = em.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("vid").asc)
    val exact = c.join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("sim", Similarity.cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("qid", "vid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // NOTE: int8 ranks by raw dot product (norm-free); exact ranks by
    // cosine. On this corpus norms are near-uniform, so recall@5 should
    // still be substantial — pin a floor, print the value.
    val recalls = exact.keys.toSeq.map { k =>
      got.getOrElse(k, Set()).intersect(exact(k)).size / 5.0 }
    val mean = recalls.sum / recalls.size
    info(f"int8-dot recall@5 vs exact cosine: $mean%.2f")
    assert(mean >= 0.5, f"recall collapsed: $mean%.2f")
    codes.unpersist()
  }
}
