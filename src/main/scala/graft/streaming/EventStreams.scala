package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table.
  *
  * The reference has NO streaming capability (SURVEY §2.10) — this module
  * is part of the beyond-parity surface: watermarked windowed
  * aggregation and stateful dedup via Spark Structured Streaming.
  *
  * For deterministic verification, the static events parquet is replayed
  * through a file-source stream into a memory sink; the same transforms
  * run unchanged against a live source (kafka/files) at scale, where
  * state lives in the checkpointed state store, partitioned by group key.
  */
object EventStreams {

  /** Stream-source schema with `ts` as the given type — the file source
    * requires an explicit schema, so the ts dtype is probed from the
    * staged file (see [[readEventStream]]) instead of hardcoded.
    */
  private def rawSchema(tsType: org.apache.spark.sql.types.DataType) = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Copy the single events.parquet into a directory so the file source
    * can watch it (repo-local tmp; no testdata mutation). Re-copies when
    * the source's size or mtime differs from the staged copy, so a
    * regenerated corpus can never silently pair a stale stream input
    * with a fresh oracle.
    */
  private def stageDir(sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = Paths.get(s"/root/repo/target/tmp/stream_events_$safe")
    Files.createDirectories(dir)
    val src = Paths.get(s"$sfDir/events.parquet")
    val dst = dir.resolve("events.parquet")
    val stale = !Files.exists(dst) ||
      Files.size(dst) != Files.size(src) ||
      Files.getLastModifiedTime(dst) != Files.getLastModifiedTime(src)
    if (stale)
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.COPY_ATTRIBUTES)
    dir.toString
  }

  /** Stream reader for events. The parquet ts unit has changed across
    * corpus drops (int64-ns → TIMESTAMP(MICROS)), and a wrong guess is
    * the *silent* 1000×-mis-scale failure mode — so probe the staged
    * file's batch-read schema, declare exactly that dtype to the stream
    * source, and branch (mirrors graft.Tables.events). Unknown dtypes
    * fail loudly.
    */
  private def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = stageDir(sfDir)
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    val raw = spark.readStream.schema(rawSchema(tsType)).parquet(dir)
    tsType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"staged events.ts read as unsupported dtype $other (expected " +
          "int64-ns, TIMESTAMP or TIMESTAMP_NTZ) — refusing to guess the time unit")
    }
  }

  /** Streaming data-quality monitor (the incremental twin of
    * operators/Profile): per event_type running row/null counts and
    * min/max/mean of `value`, maintained in complete mode — the state
    * is one row per group. The mean follows the cross-engine decimal
    * discipline (round 6dp per element, DECIMAL sum, divide at the
    * end) so the result is the exact batch answer no matter how
    * microbatches split, and the DuckDB oracle replays it.
    */
  def profileStream(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = readEventStream(spark, sfDir)
      .select(col("event_type"),
        col("value").isNull.as("vnull"),
        graft.functions.Num.rnd(col("value"), 6).cast("decimal(28,6)").as("vr"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("vnull"), 1L).otherwise(0L)).as("n_nulls"),
        min(col("vr")).cast("double").as("min_v"),
        max(col("vr")).cast("double").as("max_v"),
        count(col("vr")).as("nv"), sum(col("vr")).as("sv"))
    val name = "graft_stream_profile"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select(col("event_type"), col("n_rows"), col("n_nulls"),
        col("min_v"), col("max_v"),
        graft.functions.Num.rnd(col("sv").cast("double") / col("nv"), 6).as("mean_v"))
  }

  /** Tumbling-window aggregation (complete mode → memory sink): per
    * (hour, event_type) counts and value sums. With a live unbounded
    * source this would run in append mode with the watermark bounding
    * state; the transform is identical.
    */
  def windowedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = readEventStream(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
    val name = "graft_stream_win"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"),
        col("n"), graft.functions.Num.rnd(col("sv"), 2).as("sv"))
  }

  /** Stateful streaming dedup on event_id, then per-type counts —
    * `dropDuplicates` backed by the state store (the streaming analogue
    * of the reference's drop_duplicates, SURVEY §2.7).
    */
  def dedupCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val deduped = readEventStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"))
    val name = "graft_stream_dedup"
    val q = deduped.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** STREAM-STREAM inner interval join: each purchase matched with the
    * same user's clicks from the preceding 30 minutes. Both sides carry
    * watermarks and the join condition bounds event time on both ends,
    * so state for either side is evicted once the watermark passes its
    * join window — the unbounded-source-safe formulation (append mode).
    * One hash shuffle per side on user_id, exactly like a batch join.
    */
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val purchases = readEventStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = readEventStream(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"), col("user_id"))
    val name = "graft_stream_join"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Stream-static join: enrich the event stream with a static
    * dimension (broadcast per microbatch — the standard streaming
    * dimension-lookup; the static side can be swapped for a slowly
    * changing table without touching the stream).
    */
  def streamStaticJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val dim = spark.range(0, 1000)
      .select(col("id").as("user_id"),
        (col("id") % 5).cast("int").as("cohort"))
    val joined = readEventStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .join(broadcast(dim), Seq("user_id"), "left")
      .groupBy("cohort")
      .agg(count(lit(1)).as("n"))
    val name = "graft_stream_static"
    val q = joined.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Per-user session state for the streaming sessionizer. */
  case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long)

  /** STREAMING sessionization via `flatMapGroupsWithState` — custom
    * per-key state (SURVEY §2.10 beyond-parity surface). State is one
    * tiny record per user in the state store; each microbatch folds its
    * (locally sorted) events into it. With the bounded replay arriving
    * in a single microbatch the output equals the batch
    * [[sessionize]] — which is exactly what the oracle checks.
    */
  def sessionizeStreaming(spark: SparkSession, sfDir: String,
                          gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    val ev = readEventStream(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .as[(Long, Long, Long)]
    val out = ev.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, _, t) =>
            val newSession = st.lastTs == Long.MinValue || t - st.lastTs > gapUs
            st = SessionState(t, st.nSessions + (if (newSession) 1L else 0L), st.nEvents + 1L)
          }
          state.update(st)
          Iterator.single((user, st.nSessions, st.nEvents))
      }
    val name = "graft_stream_sessions"
    val q = out.toDF("user_id", "n_sessions", "n_events")
      .writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Batch sessionization (gaps-and-islands): a new session starts after
    * `gapMinutes` of user inactivity. Windowed lag over (user, ts) —
    * one hash shuffle on user_id; integer-µs math so the oracle matches
    * exactly.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("tus") - col("prev") > gapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
  }
}
