package graft

import org.apache.spark.sql.functions._
import graft.streaming.DocStreams

/** Streaming curation must be INCREMENTAL: dedup state has to carry
  * across microbatches, not just within one.
  */
class DocStreamsSpec extends SparkSpec {

  test("curation state accumulates across microbatches (2 files, 1 per trigger)") {
    val docs = Tables.documents(spark, sf).cache()
    val dir = "/root/repo/target/tmp/doc_stream_spec"
    // two halves as separate files; duplicates of a fingerprint can
    // land in DIFFERENT microbatches, so only cross-batch state
    // produces the right counts
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/a")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/b")
    val streamed = spark.readStream.schema(DocStreams.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*/")
    val got = DocStreams.run(spark,
        DocStreams.curateTransform(streamed, minQuality = 0.5),
        "doc_stream_spec")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = DocStreams.curateTransform(docs, minQuality = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("streaming near-dup pair set equals batch LSH across microbatches") {
    val docs = Tables.documents(spark, sf).cache()
    val dir = "/root/repo/target/tmp/doc_stream_neardup_spec"
    // near-dup PAIRS can straddle the file split: only cross-batch
    // bucket state recovers them
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/a")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/b")
    val streamed = spark.readStream.schema(DocStreams.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*/")
    val staticShingles = docs
      .select(col("doc_id"), graft.text.Shingles.shingles(col("text"), 3).as("sh"))
    val name = "doc_stream_neardup_spec"
    val q = DocStreams.nearDupTransform(streamed, staticShingles, 3, 0.5, 64, 4)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = graft.text.MinHash
      .nearDuplicates(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select(col("id1"), col("id2"), graft.functions.Num.rnd(col("jaccard"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }
}
