package graft.tools
import graft.{GraftSession, SparkEntry, Tables}
import graft.functions.Num
import graft.text.TextStats
import org.apache.spark.sql.functions._
/** Dev scratch: per-stage timing of the heavy bench queries. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    time("q102 warm1") { SparkEntry.queries("q102_curation_pipeline")(spark, d).count() }
    time("q102 warm2") { SparkEntry.queries("q102_curation_pipeline")(spark, d).count() }
    val docs = Tables.documents(spark, d)
    time("scan") { docs.count() }
    time("fingerprint") { docs.select(TextStats.fingerprint(col("text")).as("fp")).filter(col("fp").isNotNull).count() }
    time("quality") { docs.select(Num.rnd(TextStats.qualityScore(col("text")), 6).as("q")).filter(col("q") > -1).count() }
    time("langid") { docs.select(TextStats.langId(col("text")).as("l")).filter(col("l").isNotNull).count() }
    val scored = docs.select(col("doc_id"),
      TextStats.fingerprint(col("text")).as("fp"),
      Num.rnd(TextStats.qualityScore(col("text")), 6).as("quality"),
      TextStats.langId(col("text")).as("lang_guess"))
    time("scored-all") { scored.count() }
    val keepers = scored.withColumn("__keep", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("doc_id") === col("__keep")).drop("__keep")
    time("keepers") { keepers.count() }
    time("topk") { graft.plans.GroupTopK.topKPerKey(
      keepers.select("doc_id", "quality", "lang_guess"),
      Seq("lang_guess"), Seq(("quality", true), ("doc_id", false)), 5).count() }
    time("q102 again") { SparkEntry.queries("q102_curation_pipeline")(spark, d).count() }
    spark.stop()
  }
}
