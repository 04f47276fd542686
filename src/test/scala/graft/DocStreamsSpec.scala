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
}
