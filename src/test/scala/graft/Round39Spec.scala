package graft

import org.apache.spark.sql.functions._

import graft.text.ChunkIndex

/** Round-12 wave 7: persisted CDC-chunk index probe/merge (q419/q420). */
class Round39Spec extends SparkSpec {

  test("chunk index merge ≡ rebuild over corpus ∪ batch, row for row") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val merged = ChunkIndex.merge(
      ChunkIndex.build(corpus, "doc_id", "text", 8), batch, "doc_id", "text", 8)
    val rebuilt = ChunkIndex.build(docs, "doc_id", "text", 8)
    assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty)
  }

  test("probe accounting: dup chunks vs index + fresh chunks = all batch chunks") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val idx = ChunkIndex.build(corpus, "doc_id", "text", 8)
    val report = ChunkIndex.probe(idx, batch, "doc_id", "text", 8).collect()
    val perDoc = ChunkIndex.chunks(batch, "doc_id", "text", 8)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    report.foreach { r =>
      assert(r.getLong(1) == perDoc(r.getLong(0)))
      assert(r.getLong(2) <= r.getLong(1))
    }
    // an empty index marks nothing as dup
    val empty = ChunkIndex.probe(idx.filter(lit(false)), batch, "doc_id", "text", 8)
    assert(empty.agg(sum("n_dup_idx")).head().getLong(0) == 0L)
    // a batch doc identical to a corpus doc has every chunk in the index
    val clone = corpus.limit(1).withColumn("doc_id", lit(999999L))
    val full = ChunkIndex.probe(idx, clone, "doc_id", "text", 8).head()
    assert(full.getLong(2) == full.getLong(1))
  }
}
