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
    val dir = Paths.get(graft.tools.Staging.dir("stream_docs", sfDir))
    Files.createDirectories(dir)
    val src = Paths.get(s"$sfDir/documents.parquet")
    val dst = dir.resolve("documents.parquet")
    val stale = !Files.exists(dst) ||
      Files.size(dst) != Files.size(src) ||
      Files.getLastModifiedTime(dst) != Files.getLastModifiedTime(src)
    if (stale)
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.COPY_ATTRIBUTES)
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

  /** FILE-SINK twin of [[curate]] — the end-to-end production shape:
    * the same streaming query, but each trigger lands the full
    * aggregated result in a parquet directory via `foreachBatch`
    * (executor-side distributed write, overwrite-per-trigger — the
    * streaming-materialized-view idiom), and the RESULT is read back
    * from the files.  Nothing driver-bound remains in the path: the
    * memory sink used by the other gates is a test harness convenience,
    * and this twin proves the same answer arrives through a sink a
    * 100 TB deployment would actually use.  Same oracle as q137.
    */
  def curateToFiles(spark: SparkSession, sfDir: String,
                    minQuality: Double = 0.5): DataFrame = {
    // FIXED per-query path (Staging convention), overwritten per call —
    // a createTempDirectory in the system /tmp leaked one full result
    // copy per construction (bench eager passes rebuild).
    val out = graft.tools.Staging.dir("curate_files", sfDir)
    val docs = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
    val curated = curateTransform(docs, minQuality)
    @volatile var wrote = false
    val q = curated
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
        wrote = true
      }
      .start()
    q.processAllAvailable()
    q.stop()
    if (wrote) spark.read.parquet(out)
    else // zero microbatches (empty source): the result is an empty frame,
         // not an unreadable empty directory
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), curated.schema)
  }

  /** STREAMING per-group reservoir (q337's twin): state = the k
    * smallest salted keys per source, held by the mergeable
    * [[graft.functions.TopKMinAgg]] — bounded at k strings per group
    * regardless of arrival volume or order.  Key = md5 ‖ ':' ‖
    * zero-padded doc_id, so lexicographic order ≡ the batch
    * (md5, doc_id-numeric) ranking.
    */
  def reservoirStream(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val docs = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
    val keyed = docs.select(col("source"),
      concat(md5(concat(lit("rs:"), col("doc_id"))), lit(":"),
        lpad(col("doc_id").cast("string"), 12, "0")).as("key"))
    val agg = keyed.groupBy("source")
      .agg(graft.functions.TopKMinAgg.topkMin(col("key"), k).as("keys"))
    val out = run(spark, agg, "graft_stream_reservoir")
    out.select(col("source"), explode(col("keys")).as("key"))
      .select(col("source"),
        expr("cast(substring(key, 34, 12) as long)").as("doc_id"))
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

  /** Streaming MinHash-LSH near-duplicate detection — the incremental
    * twin of the batch q55 pipeline: documents arrive continuously, each
    * is banded in the scan stage (same MinHashSig expression as batch),
    * and per-bucket membership lives in `flatMapGroupsWithState` state.
    * A new document emits candidate pairs against every earlier member
    * of any of its buckets, so the accumulated pair SET is exactly the
    * batch LSH candidate set regardless of how documents split across
    * microbatches. Candidates are exact-Jaccard verified in-stream by a
    * stateless stream-static join against the corpus shingle sets.
    *
    * Scale: state per bucket is an id list only (no shingles, no
    * signatures) capped at `maxBucket` — the same boilerplate guard as
    * batch; the FMGWS shuffle moves (bucket, id) pairs, k/r per doc.
    * The same pair can surface from several bands (and is then verified
    * up to that many times — bounded by the band count); the caller
    * dedups the appended sink with one batch `distinct()`, keeping the
    * streaming query single-stateful.
    */
  def nearDupPairs(spark: SparkSession, sfDir: String,
                   n: Int = 3, threshold: Double = 0.5,
                   k: Int = 64, r: Int = 4): DataFrame = {
    val docs = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
    val staticShingles = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.text.Shingles.shingles(col("text"), n).as("sh"))
    val name = "graft_stream_neardup"
    val q = nearDupTransform(docs, staticShingles, n, threshold, k, r)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).distinct()
  }

  /** The near-dup transform itself — identical against any streaming
    * documents source; `staticShingles` is the (batch) reference corpus
    * the verify join reads.
    */
  def nearDupTransform(docStream: DataFrame, staticShingles: DataFrame,
                       n: Int, threshold: Double, k: Int, r: Int,
                       maxBucket: Int = 1000): DataFrame = {
    val spark = docStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val banded = docStream
      .select(col("doc_id"),
        posexplode(graft.text.MinHashSig.bandHashes(
          graft.text.Shingles.shingles(col("text"), n), k, r)).as(Seq("band", "h")))
      .select(col("doc_id"), concat_ws(":", col("band"), col("h")).as("bucket"))
      .as[(Long, String)]
    val pairs = banded.groupByKey(_._2)
      .flatMapGroupsWithState[BucketMembers, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String)], state: GroupState[BucketMembers]) =>
          val seen = state.getOption.map(_.ids).getOrElse(Vector.empty)
          // sorted for deterministic intra-batch pairing
          val fresh = rows.map(_._1).toVector.distinct.sorted
            .filterNot(seen.contains)
          val out = Vector.newBuilder[(Long, Long)]
          var all = seen
          fresh.foreach { id =>
            if (all.size < maxBucket)
              all.foreach(p => out += ((math.min(p, id), math.max(p, id))))
            all = all :+ id
          }
          state.update(BucketMembers(all))
          out.result().iterator
      }
      .toDF("id1", "id2")
    val s1 = staticShingles.select(col("doc_id").as("id1"), col("sh").as("sh1"))
    val s2 = staticShingles.select(col("doc_id").as("id2"), col("sh").as("sh2"))
    pairs.join(s1, "id1").join(s2, "id2")
      .withColumn("jaccard", graft.functions.Num.rnd(
        graft.text.Shingles.jaccard(col("sh1"), col("sh2")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Windowed streaming near-dup with WATERMARK-EVICTED state — the
    * unbounded-stream variant of [[nearDupTransform]]. That shape's
    * bucket state grows forever; on a perpetual ingestion stream the
    * state store IS the scaling limit. Here each bucket member carries
    * its event time, a candidate pair is emitted only when the two
    * documents' event times lie within `horizon` of each other (the
    * "recent near-dup" contract: a re-crawl months later is allowed
    * again), and state is evicted two ways:
    *
    *  - inline: members older than `watermark - horizon` are dropped on
    *    every bucket visit (no future row can pair with them — rows
    *    below the watermark are filtered as late, so any future ts ≥
    *    watermark, and the pair predicate needs ts ≥ member.ts -
    *    horizon);
    *  - timeout: `EventTimeTimeout` fires once the watermark passes the
    *    bucket's newest member + horizon and removes the whole bucket —
    *    buckets that stop receiving documents cost nothing forever.
    *
    * Emission is decided by the explicit |Δts| ≤ horizon predicate, so
    * the output SET is deterministic (exact time-filtered pairs) no
    * matter how microbatches split, as long as no data arrives later
    * than the configured watermark delay.
    *
    * `docStream` must carry an event-time `ts` (timestamp) column; the
    * transform applies the 10-minute watermark itself (EventTimeTimeout
    * requires the watermarked column in the FMGWS input).
    */
  def nearDupTransformWindowed(docStream: DataFrame, staticShingles: DataFrame,
                               n: Int, threshold: Double, k: Int, r: Int,
                               horizonMs: Long, maxBucket: Int = 1000): DataFrame = {
    val spark = docStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val banded = docStream
      .select(col("doc_id"),
        expr("unix_micros(ts) div 1000").as("tms"),
        posexplode(graft.text.MinHashSig.bandHashes(
          graft.text.Shingles.shingles(col("text"), n), k, r)).as(Seq("band", "h")))
      // the watermarked event-time column must survive into the FMGWS
      // input or the UnsupportedOperationChecker rejects EventTimeTimeout
      .select(col("doc_id"), col("tms"),
        concat_ws(":", col("band"), col("h")).as("bucket"),
        timestamp_millis(col("tms")).as("ts"))
      .withWatermark("ts", "10 minutes")
      .as[(Long, Long, String, java.sql.Timestamp)]
    val pairs = banded.groupByKey(_._3)
      .flatMapGroupsWithState[TimedMembers, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[(Long, Long, String, java.sql.Timestamp)],
         state: GroupState[TimedMembers]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            // inline eviction: nothing at ts < wm - horizon can pair again
            val seen = state.getOption.map(_.ms).getOrElse(Vector.empty)
              .filter(_.ts >= wm - horizonMs)
            val fresh = rows.map(t => TimedMember(t._1, t._2)).toVector
              .distinct.sortBy(m => (m.ts, m.id))
              .filterNot(m => seen.exists(_.id == m.id))
            val out = Vector.newBuilder[(Long, Long)]
            var all = seen
            fresh.foreach { m =>
              if (all.size < maxBucket)
                all.foreach { p =>
                  if (math.abs(p.ts - m.ts) <= horizonMs)
                    out += ((math.min(p.id, m.id), math.max(p.id, m.id)))
                }
              all = all :+ m
            }
            state.update(TimedMembers(all))
            // whole-bucket eviction once nothing can ever pair again
            if (all.nonEmpty)
              state.setTimeoutTimestamp(all.map(_.ts).max + horizonMs + 1)
            out.result().iterator
          }
      }
      .toDF("id1", "id2")
    val s1 = staticShingles.select(col("doc_id").as("id1"), col("sh").as("sh1"))
    val s2 = staticShingles.select(col("doc_id").as("id2"), col("sh").as("sh2"))
    pairs.join(s1, "id1").join(s2, "id2")
      .withColumn("jaccard", graft.functions.Num.rnd(
        graft.text.Shingles.jaccard(col("sh1"), col("sh2")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** [[nearDupTransformWindowed]] over the replayed corpus with a
    * synthetic event time (doc_id minutes — deterministic, so the
    * time-filtered exact-pair SQL is the oracle). Single staged file →
    * one microbatch → the initial watermark (0) filters nothing; the
    * eviction paths are exercised by the multi-batch spec.
    */
  def nearDupPairsWindowed(spark: SparkSession, sfDir: String,
                           n: Int = 3, threshold: Double = 0.5,
                           k: Int = 64, r: Int = 4,
                           horizonMinutes: Long = 100): DataFrame = {
    val docs = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
      .withColumn("ts", timestamp_seconds(lit(86400L) + col("doc_id") * 60))
    val staticShingles = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.text.Shingles.shingles(col("text"), n).as("sh"))
    val name = "graft_stream_neardup_win"
    val q = nearDupTransformWindowed(docs, staticShingles, n, threshold, k, r,
        horizonMs = horizonMinutes * 60000L)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).distinct()
  }

  /** STREAMING chunk-index probe — the live-ingest twin of q419: new
    * documents arrive as a stream, are CDC-chunked in the scan stage
    * (native kernel), and each chunk stream-static joins the persisted
    * corpus chunk index (built once, cached for the run). The per-doc
    * report is a streaming aggregation keyed by doc_id — state is one
    * row per in-flight document. At 100 TB the index summary is loaded
    * once per executor; each microbatch pays only its own chunking plus
    * a hash join keyed by chunk hash.
    */
  def chunkIndexProbeStream(spark: SparkSession, sfDir: String,
                            modulus: Int = 8): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val index = graft.text.ChunkIndex
      .build(corpus, "doc_id", "text", modulus)
      .select(col("chunk_md5"), lit(true).as("__hit")).cache()
    try {
      val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
        .filter(col("doc_id") % 10 === 0)
      val report = graft.text.ChunkIndex
        .chunks(stream, "doc_id", "text", modulus)
        .join(index, Seq("chunk_md5"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("__hit"), 1L).otherwise(0L)).as("n_dup_idx"),
          sum(when(col("__hit"), col("n_toks").cast("long")).otherwise(0L))
            .as("dup_tokens"))
      run(spark, report, "graft_stream_chunk_probe")
    } finally index.unpersist(blocking = false)
  }

  /** STREAMING incremental near-dup — the live-ingest twin of
    * q194_incremental_dedup: new documents arrive as a stream and
    * probe a STATIC corpus LSH bucket index
    * ([[graft.text.MinHash.bucketIndex]]); only candidate pairs reach
    * the exact-Jaccard verify (a stream-static join whose static side
    * is the cached corpus shingle table). The stateful aggregation
    * keys on the output pair — state is bounded by true-duplicate
    * count, never corpus size. At 100 TB this is how a crawl frontier
    * is deduplicated: the bucket lists and corpus shingles are loaded
    * once per executor; each microbatch pays only its own banding plus
    * bucket-join.
    */
  def incrementalDedup(spark: SparkSession, sfDir: String,
                       maxBucket: Int = 1000): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
      .filter(col("doc_id") % 5 === 0)
    run(spark, incrementalDedupTransform(stream, corpus, maxBucket = maxBucket),
      "graft_stream_incr_dedup")
  }

  /** The transform itself — works against any streaming (or batch)
    * documents source; the static sides (bucket lists + corpus
    * shingles) are built from `corpus` and cached.
    */
  def incrementalDedupTransform(stream: DataFrame, corpus: DataFrame,
                                n: Int = 3, threshold: Double = 0.5,
                                k: Int = 64, r: Int = 4,
                                maxBucket: Int = 1000): DataFrame = {
    import graft.text.{MinHash, MinHashSig, Shingles}
    val buckets = MinHash.bucketIndex(corpus, "doc_id", "text", n, k, r)
      .groupBy("band", "h").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) <= maxBucket).cache()
    val corpusSh = corpus.select(col("doc_id").as("corpus_id"),
      Shingles.shingles(col("text"), n).as("csh")).cache()
    val probes = stream
      .select(col("doc_id").as("new_id"),
        Shingles.shingles(col("text"), n).as("sh"))
      .select(col("new_id"), col("sh"),
        posexplode(MinHashSig.bandHashes(col("sh"), k, r)).as(Seq("band", "h")))
    val verified = probes.join(buckets, Seq("band", "h"))
      .select(col("new_id"), col("sh"), explode(col("ids")).as("corpus_id"))
      .filter(col("new_id") =!= col("corpus_id"))
      .join(corpusSh, "corpus_id")
      .withColumn("jaccard", Shingles.jaccard(col("sh"), col("csh")))
      .filter(col("jaccard") >= threshold)
    // bands emit repeat candidates; the stateful agg collapses them
    // (jaccard is identical per repeat — max is just the collapse)
    verified.groupBy("new_id", "corpus_id")
      .agg(max(col("jaccard")).as("jaccard"))
  }

  /** Drain a streaming frame through a complete-mode memory sink. */
  /** Streaming bloom-gated decontamination (q189's gate, incremental):
    * the eval-set bloom is built ONCE batch-side and rides the
    * microbatch plan as a literal; arriving documents explode to
    * grams, non-candidates drop at the scan via the codegen'd
    * `BloomFilterMightContain`, and the stream-static join against the
    * exact eval grams removes false positives — one stateful
    * aggregation (per-source hit totals), state keyed by source only.
    * At 100 TB this is the live-ingest contamination monitor: the
    * bloom is the only thing every executor holds of a 10⁹-gram eval
    * set.
    */
  def decontamGate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.text.{BloomGate, Shingles}
    val sh = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), Shingles.shingles(col("text"), 3).as("sh"))
    val evalGrams = sh.filter(col("doc_id") % 37 === 0)
      .select(explode(col("sh")).as("g")).distinct().cache()
    val bloom = BloomGate.build(evalGrams, col("g"),
      expectedItems = math.max(evalGrams.count(), 1L))
    val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
    val hits = stream.filter(col("doc_id") % 37 =!= 0)
      .select(col("source"),
        explode(Shingles.shingles(col("text"), 3)).as("g"))
      .filter(BloomGate.mightContain(bloom, col("g")))
      .join(evalGrams, "g") // stream-static exact verify
      .groupBy("source").agg(count(lit(1)).as("n_hits"))
    run(spark, hits, "graft_stream_decontam")
  }

  /** Streaming chunk-level dedup election (the stateful half of
    * [[graft.text.ChunkDedup]]): documents arrive continuously, chunks
    * are cut in the scan stage (stateless), and the only state is one
    * (16-byte hash → (doc_id, idx)) row per DISTINCT chunk — the
    * minimum election is order-independent, so the streamed result
    * converges to the batch election no matter how documents split
    * across microbatches. Reassembly is a stateless batch join
    * afterwards (ChunkDedup.assemble), the same
    * elect-in-stream/finish-in-batch split as q150's verify.
    */
  def chunkDedupStream(spark: SparkSession, sfDir: String,
                       k: Int = 10): DataFrame = {
    import graft.text.ChunkDedup
    val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
    val elected = run(spark,
      ChunkDedup.elect(ChunkDedup.chunks(stream, "doc_id", "text", k), "doc_id"),
      "graft_stream_chunk_elect")
    val docs = graft.Tables.documents(spark, sfDir)
    ChunkDedup.assemble(docs, ChunkDedup.chunks(docs, "doc_id", "text", k),
      elected, "doc_id")
  }

  /** STREAMING gram-index probe — the live-ingest twin of q431: new
    * documents arrive as a stream, are gram-scanned in the scan stage
    * (native NgramList), and each gram stream-static joins the
    * persisted corpus gram index. The per-doc streaming aggregation
    * collects the HIT POSITIONS (state ∝ the doc's own duplicated
    * grams — bounded by doc length); the maximal spans are then a
    * scan-stage fold over the sorted positions: union length =
    * L + Σ min(gap, L), span count = 1 + #{gap > L} — the closed form
    * of the batch islands window, so the stream needs no window at all.
    */
  def gramIndexProbeStream(spark: SparkSession, sfDir: String,
                           L: Int = 8): DataFrame =
    gramProbe(spark, sfDir, L)(run(spark, _, "graft_stream_gram_probe"))

  /** FILE-SINK twin of [[gramIndexProbeStream]] (the q397 idiom applied
    * to the index-probe family): the identical streaming query, but
    * each trigger lands the probe report in a parquet directory via
    * `foreachBatch` (executor-side distributed write, overwrite-per-
    * trigger) and the result is read back from the files — retiring the
    * memory-sink caveat for the stateful index-probe path too.  Same
    * oracle as q431/q433.
    */
  def gramIndexProbeStreamToFiles(spark: SparkSession, sfDir: String,
                                  L: Int = 8): DataFrame =
    gramProbe(spark, sfDir, L) { report =>
      val out = graft.tools.Staging.dir("gram_probe_files", sfDir)
      @volatile var wrote = false
      val q = report.writeStream.outputMode("complete")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
          wrote = true
        }
        .start()
      q.processAllAvailable()
      q.stop()
      if (wrote) spark.read.parquet(out)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), report.schema)
    }

  /** STREAMING Naive-Bayes classification — the ingest-time language/
    * quality filter: the model is FIT in batch ([[graft.text.NaiveBayes
    * .fitModel]]), FROZEN to exact 6dp-grid longs, and rides the
    * closure; each arriving document is classified in the scan stage
    * (STATELESS — no join, no aggregation, microbatch-invariant by
    * construction, the q261 frozen-classifier deployment shape). The
    * returned frame aggregates the appended predictions into q437's
    * confusion matrix, so the batch oracle gates the stream.
    */
  def nbClassifyStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val frozen = graft.text.NaiveBayes.freeze(
      graft.text.NaiveBayes.fitModel(
        docs.filter(col("doc_id") % 10 =!= 0), "text", "lang"))
    val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, graft.text.NaiveBayes.classify(frozen, text)) }
      .toDF("doc_id", "pred_lang")
    val preds = runAppend(spark, stream, "graft_stream_nb_classify")
    preds.join(docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("lang").as("true_lang")), "doc_id")
      .groupBy("true_lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** STREAMING rejection audit — the ingest-time twin of q448: each
    * arriving document is attributed to its first failing curation rule
    * in the scan stage (the CASE chain rides the plan — stateless per
    * row), and the running (source, reason) counts are the only state
    * (bounded at |sources|×|rules| regardless of volume).
    */
  def rejectAuditStream(spark: SparkSession, sfDir: String,
                        reason: org.apache.spark.sql.Column): DataFrame = {
    val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
      .select(col("source"), reason.as("reason"))
      .groupBy("source", "reason").agg(count(lit(1)).as("n_docs"))
    run(spark, stream, "graft_stream_reject_audit")
  }

  /** STREAMING PSI drift monitor — the live half of q447: the reference
    * histogram is a tiny batch aggregate; arriving documents fold into
    * a (source, bucket) running histogram (state bounded at
    * |sources|×buckets regardless of volume), and the PSI arithmetic
    * runs in batch over the two tiny tables. Gated by its own
    * split-vs-split oracle (q451).
    */
  def psiStream(spark: SparkSession, sfDir: String, nBuckets: Int = 8): DataFrame = {
    import graft.operators.Psi
    val docs = graft.Tables.documents(spark, sfDir)
    val ref = Psi.hist(docs.filter(col("doc_id") % 10 =!= 0), nBuckets, "cb")
    val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
      .filter(col("doc_id") % 10 === 0)
      .select(col("source"), Psi.bucketCol(nBuckets).as("bucket"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("cn"))
    val hn = run(spark, stream, "graft_stream_psi")
    Psi.fold(ref, hn, nBuckets)
  }

  /** STREAMING CDC upsert — the live table-maintenance twin of batch
    * q442: the change batch is staged as key-disjoint shard FILES, read
    * with `maxFilesPerTrigger=1` (so the merge genuinely runs across
    * MULTIPLE microbatches), and each trigger folds its changes into a
    * VERSIONED parquet table directory via `foreachBatch` (read current
    * version → one full-outer merge join → write next version — the
    * copy-on-write loop a Delta/Iceberg MERGE runs, distilled to plain
    * parquet). Key-disjoint batches make sequential application ≡ the
    * one-shot batch merge, so q442's oracle gates the stream.
    */
  def cdcUpsertStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.SaveMode
    import graft.operators.CdcUpsert
    val docs = graft.Tables.documents(spark, sfDir)
    val base = docs.select(col("doc_id"), col("text"), col("source"))
    val changes = CdcUpsert.changesOf(docs)
    // stage the change stream: 4 shard files, disjoint by key
    val srcDir = graft.tools.Staging.dir("cdc_changes", sfDir)
    changes.repartition(4, pmod(col("doc_id"), lit(4)))
      .write.mode(SaveMode.Overwrite).parquet(srcDir)
    val tabDir = graft.tools.Staging.dir("cdc_table", sfDir)
    base.write.mode(SaveMode.Overwrite).parquet(s"$tabDir/v0")
    @volatile var cur = 0
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val current = spark.read.parquet(s"$tabDir/v$cur")
        CdcUpsert.applyChanges(current, batch)
          .write.mode(SaveMode.Overwrite).parquet(s"$tabDir/v${cur + 1}")
        cur += 1
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(s"$tabDir/v$cur")
      .select(col("doc_id"), md5(col("text")).as("text_md5"), col("source"))
  }

  private def gramProbe(spark: SparkSession, sfDir: String, L: Int)
                       (sink: DataFrame => DataFrame): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val index = graft.text.GramIndex.build(corpus, "doc_id", "text", L)
      .select(col("gram_md5")).cache()
    try {
      val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
        .filter(col("doc_id") % 10 === 0)
      val report = graft.text.GramIndex.grams(stream, "doc_id", "text", L)
        .join(index, Seq("gram_md5"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("p"))).as("ps"))
        .select(col("doc_id"), expr(
          s"""aggregate(slice(ps, 2, greatest(size(ps) - 1, 0)),
              named_struct('prev', ps[0], 'tok', $L, 'spans', 1),
              (a, x) -> named_struct('prev', x,
                'tok', a.tok + least(x - a.prev, $L),
                'spans', a.spans + IF(x - a.prev > $L, 1, 0)))""").as("r"))
        .select(col("doc_id"),
          col("r.spans").cast("long").as("n_spans"),
          col("r.tok").cast("long").as("dup_tokens"))
      sink(report)
    } finally index.unpersist(blocking = false)
  }

  def run(spark: SparkSession, streamed: DataFrame, name: String): DataFrame = {
    val q = streamed.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Append-mode twin of [[run]] for STATELESS transforms (per-row maps
    * like tokenization — no aggregation, so "complete" is illegal and
    * unnecessary; each microbatch appends its rows once).
    */
  def runAppend(spark: SparkSession, streamed: DataFrame, name: String): DataFrame = {
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Streaming BPE tokenization — the ingest-time twin of batch q217.
    * Stateless scan-stage map (the merge table rides the closure), so
    * the result is microbatch-invariant by construction: no state, no
    * watermark, each doc encoded exactly once on arrival.
    */
  def bpeStream(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.text.{Bpe, BpeMerges}
    val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
    val enc = Bpe.encodeKernel(stream, "doc_id", "text",
        Bpe.Model(BpeMerges.pretrained))
      .select(col("doc_id"), col("n_tok"),
        org.apache.spark.sql.functions.md5(col("bpe_repr")).as("bpe_md5"))
    runAppend(spark, enc, "graft_stream_bpe")
  }

  /** Streaming OVERLAPPING chunking — the ingest-time twin of batch
    * q406: each arriving document is cut into sliding windows entirely
    * in the scan stage (native [[graft.text.SlidingChunkSet]] pass).
    * Stateless → microbatch-invariant by construction.
    */
  def chunkOverlapStream(spark: SparkSession, sfDir: String,
                         k: Int, stride: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
    val out = stream.select(col("doc_id"),
      explode(ColumnBridge.column(graft.text.SlidingChunkSet(
        ColumnBridge.expression(col("text")), k, stride))).as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("c.chunk"), " ")).as("n_toks"),
        org.apache.spark.sql.functions.md5(col("c.chunk")).as("chunk_md5"))
    runAppend(spark, out, "graft_stream_chunk_overlap")
  }

  /** Streaming decontamination — the ingest-time twin of batch q221:
    * each arriving corpus document is checked against the STATIC eval
    * gram set entirely in the scan stage. The eval set is
    * benchmark-sized by contract, so its distinct grams collect to a
    * driver array and ride the plan as one literal (sorted —
    * deterministic); `array_intersect` against it is exact, so there
    * are no bloom false positives to kill and no state — a stateless
    * map, microbatch-invariant by construction. An eval set too large
    * to collect is the batch q221 shape (bloom gate + verify join),
    * not this one.
    */
  def decontaminateStream(spark: SparkSession, sfDir: String,
                          n: Int = 4): DataFrame = {
    import graft.text.Shingles
    val evalGrams = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source") === "src9")
      .select(explode(Shingles.shingles(col("text"), n)).as("g"))
      .distinct().orderBy("g")
      .collect().map(_.getString(0)).toSeq
    val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
      .filter(col("source") =!= "src9")
    val out = stream.select(col("doc_id"),
        size(array_intersect(Shingles.shingles(col("text"), n),
          typedLit(evalGrams))).cast("long").as("hit_grams"))
      .withColumn("contaminated", col("hit_grams") > 0)
    runAppend(spark, out, "graft_stream_decontam")
  }

  /** Streaming heavy hitters — the ingest-time twin of batch q232's
    * vocabulary top-k: a stateful streaming word-count (state = one row
    * per distinct word, hash-partitioned; the streaming analogue of the
    * batch exact verify pass), with the top-k election done batch-side
    * over the complete-mode result.  Counts are exact and
    * microbatch-invariant (pure additive state), so the batch SQL
    * oracle matches the streaming result bit-for-bit.
    *
    * At scale the state-per-word shape is the cost you pay for EXACT
    * continuous counts; the bounded-memory alternative (a MisraGries
    * sketch per state shard, candidates re-verified batch-side) is the
    * batch q232 plan and drops in here unchanged if the vocabulary
    * outgrows the state store.
    */
  def heavyHittersStream(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
    val counts = stream
      .select(explode(graft.text.TextStats.tokensNonEmpty(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val table = run(spark, counts, "graft_stream_hh")
    graft.operators.Sorts.topK(table, Seq("cnt", "word"), Seq(false, true), k)
  }

  /** Streaming weighted sampling — the ingest-time twin of batch q231:
    * a bounded A-ES reservoir ([[graft.operators.EsReservoir]]) held as
    * ONE O(k) state row.  Each arriving document's deterministic
    * ln(u)/w key is computed in the scan stage; the reservoir keeps the
    * running top-k, and reservoir merge = top-k of union, so the final
    * sample is microbatch-invariant and equals the batch selection
    * exactly — the q231 oracle checks it.
    */
  def weightedSampleStream(spark: SparkSession, sfDir: String,
                           k: Int = 50): DataFrame = {
    import graft.operators.{EsRow, EsReservoir, WeightedSample}
    val stream = spark.readStream.schema(docSchema).parquet(stageDir(sfDir))
      .filter(col("n_chars") > 0)
    val agg = udaf(new EsReservoir(k),
      org.apache.spark.sql.Encoders.product[EsRow])
    val sampled = stream.select(
        WeightedSample.esKey(col("doc_id"), col("n_chars"), "es").as("key"),
        col("doc_id").as("docId"), col("source"),
        col("n_chars").as("nChars"))
      .agg(agg(col("key"), col("docId"), col("source"), col("nChars")).as("top"))
    val table = run(spark, sampled, "graft_stream_wsample")
    table.select(explode(col("top")).as("r"))
      .select(col("r.docId").as("doc_id"), col("r.source"),
        col("r.nChars").as("n_chars"))
  }

  /** The raw document stream schema, for spec-built sources. */
  def schema: StructType = docSchema
}

/** FMGWS state for [[DocStreams.nearDupTransform]]: ids seen per LSH
  * bucket (no shingles or signatures — state stays id-sized).
  */
final case class BucketMembers(ids: Vector[Long])

/** A bucket member with its event time (ms) — the eviction handle. */
final case class TimedMember(id: Long, ts: Long)

/** FMGWS state for [[DocStreams.nearDupTransformWindowed]]. */
final case class TimedMembers(ms: Vector[TimedMember])
