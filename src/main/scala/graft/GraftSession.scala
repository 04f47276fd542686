package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * The reference (legate.pandas) sizes its run by `num_pieces` equal chunks
  * (reference `legate/pandas/core/runtime.py:347`); Spark's analogue is the
  * shuffle-partition count plus AQE coalescing. We default AQE on so that
  * runtime statistics re-plan skewed joins and coalesce small shuffle
  * partitions — the scale path for 100 TB inputs.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // parallelismFirst stays at its default (true): a small-byte but
      // CPU-heavy shuffle (e.g. counting 1M+ distinct pair keys in ~10MB)
      // must keep all cores busy; coalescing it to one partition by size
      // alone serializes the aggregation. On a real cluster the same
      // default keeps reduce stages at executor parallelism.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE's coalescing floor defaults to 1 MiB per partition, which
      // serializes small-byte but CPU-heavy reduce stages (r13 probe:
      // q203's window stage carried 0.78 s of task time in a ~2 MiB
      // shuffle → AQE coalesced it to 2 tasks; 64k floor → 32 tasks,
      // query best 1.26→0.53 s; the 12-query floor-set A/B improved
      // 9.0→8.1 s with no regressions). At cluster scale shuffle
      // partitions are ≫ 64k, so the lower floor is inert there —
      // parallelismFirst still targets default parallelism.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      // Input-split twin of the coalescing floor above: 128 MiB splits
      // pack this engine's CPU-dense scans (tokenizing text kernels,
      // embedding folds, decimal aggs — bytes underestimate CPU by
      // 10-100×) into 1-3 tasks at the gated SFs, idling 29+ cores on
      // the longest stage. 16 MiB splits keep scan stages at machine
      // width: sf0.1 headline 16.9→13.9 s, sf10 tier 62.9→59.0 s, no
      // regressions (r13 A/B). A pure-columnar-scan deployment at PB
      // scale would override back via SPARK_GRAFT_CONF — the same knob
      // every production tuning guide reaches for in either direction.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // Always use the sort-based (serialized) shuffle writer. The
      // default bypass-merge writer kicks in whenever reducers <= 200 —
      // i.e. EVERY shuffle at our 32-partition conf — and opens one
      // DiskBlockObjectWriter + LZ4 stream PER REDUCER PER MAP TASK
      // (32 x 32 = 1024 file opens + codec inits per shuffle; JFR r12
      // showed DiskBlockObjectWriter.open/lz4Factory as the hottest map
      // frames, ~0.25s of fixed cost per map task). The sort writer
      // produces one file + index per map task regardless of reducer
      // count — the same writer any >200-reducer cluster job uses, so
      // this only removes a small-fanout pathology, never changes the
      // scale path.
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      // Experiment/deploy passthrough: "k=v;k=v" — lets perf A/B runs
      // (and a real cluster submit) override any SQL conf without a
      // rebuild. Ignored when unset.
      .applyExtraConf

  private implicit class ExtraConf(b: SparkSession.Builder) {
    def applyExtraConf: SparkSession.Builder =
      sys.env.get("SPARK_GRAFT_CONF").fold(b) { s =>
        s.split(';').filter(_.contains('=')).foldLeft(b) { (bb, kv) =>
          val Array(k, v) = kv.split("=", 2)
          bb.config(k.trim, v.trim)
        }
      }
  }

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
