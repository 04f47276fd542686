package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the documents corpus — the INCREMENTAL
  * curation shape: documents arrive continuously, each microbatch is
  * quality-gated with the scan-stage scoring expressions, and exact
  * dedup state (one row per content fingerprint) lives in the state
  * store, partitioned by fingerprint hash.
  *
  * This is the production ingestion pattern for a training-data
  * pipeline at 100 TB: the quality/fingerprint expressions are the SAME
  * codegen'd columns as the batch path (TextStats), the stateful
  * aggregation shuffles only (16-byte fp, doc_id) pairs, and swapping
  * the replayed file source for a live kafka/files source changes no
  * transform. Deterministic output (min doc_id per fingerprint), so the
  * batch SQL oracle checks the streaming result exactly.
  */
object DocStreams {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Stage documents.parquet into a watchable dir (repo-local tmp). */
  private def stageDir(sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = Paths.get(s"/root/repo/target/tmp/stream_docs_$safe")
    Files.createDirectories(dir)
    val dst = dir.resolve("documents.parquet")
    if (!Files.exists(dst))
      Files.copy(Paths.get(s"$sfDir/documents.parquet"), dst,
        StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  /** Streaming curation: quality gate → stateful exact dedup.
    * Output (fp, keeper = min doc_id, n) — the streaming twin of the
    * batch q53 dedup, restricted to documents whose (rounded) quality
    * score clears `minQuality`.
    */
  def curate(spark: SparkSession, sfDir: String,
             minQuality: Double = 0.5): DataFrame = {
    val docs = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
    run(spark, curateTransform(docs, minQuality), "graft_stream_curate")
  }

  /** The curation transform itself — identical against any streaming (or
    * batch) documents source.
    */
  def curateTransform(docs: DataFrame, minQuality: Double): DataFrame = {
    import graft.text.TextStats
    docs
      .select(col("doc_id"),
        TextStats.fingerprint(col("text")).as("fp"),
        graft.functions.Num.rnd(TextStats.qualityScore(col("text")), 6).as("q"))
      .filter(col("q") >= minQuality)
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
  }

  /** Drain a streaming frame through a complete-mode memory sink. */
  def run(spark: SparkSession, streamed: DataFrame, name: String): DataFrame = {
    val q = streamed.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** The raw document stream schema, for spec-built sources. */
  def schema: StructType = docSchema
}
