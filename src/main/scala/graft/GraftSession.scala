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
