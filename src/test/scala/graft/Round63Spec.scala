package graft

import org.apache.spark.sql.functions._

/** Round-13 wave 6: shard manifest + streaming PSI (q450-q451). */
class Round63Spec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q450 manifest: shards tile the rank space; checksums differ") {
    val out = run("q450_shard_manifest").cache()
    try {
      val n = Tables.documents(spark, sf).count()
      assert(out.agg(sum("n_docs")).collect()(0).getLong(0) === n)
      val rows = out.orderBy("shard").collect()
      // contiguous, non-overlapping rank ranges in shard order
      var expect = 1L
      rows.foreach { r =>
        assert(r.getLong(3) === expect, s"shard ${r.getLong(0)} first_rank")
        assert(r.getLong(4) === r.getLong(3) + r.getLong(1) - 1)
        expect = r.getLong(4) + 1
      }
      // order-sensitive checksum: distinct across shards
      assert(rows.map(_.getString(5)).distinct.length === rows.length)
    } finally out.unpersist()
  }

  test("q451 streaming PSI ≡ batch fold over the same splits") {
    import graft.operators.Psi
    val docs = Tables.documents(spark, sf)
    val batch = Psi.fold(
      Psi.hist(docs.filter(col("doc_id") % 10 =!= 0), 8, "cb"),
      Psi.hist(docs.filter(col("doc_id") % 10 === 0), 8, "cn"), 8)
    val stream = run("q451_stream_psi")
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("Psi.fold: identical histograms → psi exactly 0") {
    import graft.operators.Psi
    val docs = Tables.documents(spark, sf)
    val h = Psi.hist(docs, 8, "cb")
    val same = Psi.fold(h, h.withColumnRenamed("cb", "cn"), 8).collect()
    same.foreach(r => assert(r.getDouble(1) === 0.0, r.toString))
  }
}
