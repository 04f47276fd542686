package graft

import org.apache.spark.sql.functions._

/** Round-12 wave: decontaminated split invariants (q398). */
class Round33Spec extends SparkSpec {

  test("decontaminated split: mass conserved, eval untouched, leak ⊆ train ∩ near-dup-of-eval") {
    val fn = SparkEntry.queries("q398_decontaminated_split")
    val out = fn(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    val total = docs.count()

    // (1) conservation: every doc lands in exactly one of the tiers
    val byTier = out.groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTier.values.sum == total, s"tiers $byTier must sum to $total")
    assert(byTier.keySet.subsetOf(Set("train", "eval", "leak")))

    // (2) the eval tier is exactly the hash draw — decontamination must
    // never move or remove eval docs (only train docs quarantine)
    val trainHex = { // q148 encoding, rate 0.9
      val t = (BigDecimal(BigInt(1) << 64) * 0.9).toBigInt
      String.format("%016x", t.bigInteger)
    }
    val evalHash = docs.filter(
      substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 16)
        >= lit(trainHex)).count()
    assert(byTier.getOrElse("eval", 0L) == evalHash)

    // (3) every leaked doc is a hash-train doc with a verified near-dup
    // partner in hash-eval (replay the pair derivation independently)
    val pairs = graft.text.MinHash
      .nearDuplicates(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id1", "id2")
    val sym = pairs.unionByName(
      pairs.select(col("id2").as("id1"), col("id1").as("id2")))
    val split0 = docs.select(col("doc_id"),
      when(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 16)
        < lit(trainHex), "train").otherwise("eval").as("s"))
    val expectedLeak = sym
      .join(split0.select(col("doc_id").as("id1"), col("s").as("s1")), "id1")
      .join(split0.select(col("doc_id").as("id2"), col("s").as("s2")), "id2")
      .filter(col("s1") === "train" && col("s2") === "eval")
      .select("id1").distinct().count()
    assert(byTier.getOrElse("leak", 0L) == expectedLeak)
    out.unpersist()
  }
}
