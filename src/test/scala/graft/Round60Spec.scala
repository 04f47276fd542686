package graft

import org.apache.spark.sql.functions._

/** Round-13 wave 3: embed-index retention delete, snapshot diff
  * (q444-q445).
  */
class Round60Spec extends SparkSpec {

  test("q444 retention delete ≡ rebuild-from-survivors (frozen modulus)") {
    import graft.similarity.Similarity
    val em = Tables.embeddings(spark, sf)
    val corpus = em.filter(col("vec_id") % 97 =!= 0)
    val deleted = corpus.filter(col("vec_id") % 7 === 3).select("vec_id")
    val idx = Similarity.embedCellIndex(corpus, tables = 4)
    val repaired = Similarity.retentionDeleteEmbedIndex(idx, deleted)
    // rebuild over survivors but with the BUILD-time modulus frozen
    val c = idx.agg(max("c")).collect()(0).getLong(0)
    val rebuilt = Similarity.embedCellIndex(
      corpus.filter(col("vec_id") % 7 =!= 3), tables = 4, frozenC = Some(c))
    assert(repaired.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(repaired).isEmpty)
    // the deletion actually removed rows
    assert(repaired.count() < idx.count())
  }

  test("q445 diff ∘ apply round-trip recovers the effective change set") {
    import graft.operators.CdcUpsert
    val docs = Tables.documents(spark, sf)
    val base = docs.select(col("doc_id"), col("text"), col("source"))
    val changes = CdcUpsert.changesOf(docs)
    val next = CdcUpsert.applyChanges(base, changes)
    val derived = CdcUpsert.deriveChanges(base, next)
    // effective changes: drop U rows that didn't alter the text (none
    // here — updates double the text) and project to the derived shape
    val effective = changes.select(col("doc_id"), col("op"),
      when(col("op") =!= "D", md5(col("new_text"))).as("text_md5"))
    assert(derived.exceptAll(effective).isEmpty &&
      effective.exceptAll(derived).isEmpty)
  }

  test("q445 diff of identical snapshots is empty") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
    assert(graft.operators.CdcUpsert.deriveChanges(docs, docs).isEmpty)
  }
}
