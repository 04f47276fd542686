package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Dev scratch: q232's fit-every-call heavy hitters vs the r11
  * persisted-sketch contract (fitSketch once → topKFrequentPrefit per
  * call) on a staged corpus — the BASELINE.md q232 re-pairing.
  *
  * Usage: tools/run_verify.sh <stagedDir> y graft.tools.BenchMgPrefit
  */
object BenchMgPrefit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/repo/target/tmp/sf100x")
    def words = Tables.documents(spark, d)
      .select(explode(graft.text.TextStats.tokensNonEmpty(col("text")))
        .as("word"))
    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.2fs rows=$n"); s
    }
    val sketchPath = s"$d/mg_sketch_512"
    // fit once (timed separately — the amortized-away cost)
    time("fit_sketch") {
      graft.functions.MisraGries.fitSketch(words, "word", 512)
        .write.mode("overwrite").parquet(sketchPath)
      1L
    }
    (1 to 3).foreach { i =>
      time(s"prefit-$i") {
        graft.functions.MisraGries.topKFrequentPrefit(
          words, "word", 10, spark.read.parquet(sketchPath)).count()
      }
      time(s"fit_every_call-$i") {
        graft.functions.MisraGries.topKFrequent(words, "word", 10, 512).count()
      }
    }
    spark.stop()
  }
}
