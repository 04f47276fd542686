package graft.tools

import graft.{GraftSession, Tables}

/** Dev scratch: semDedupScaled (split-cap) vs semDedupBanded on a
  * staged corpus — the r10 window-elimination measurement.
  */
object BenchSemDedup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/repo/target/tmp/emb_rot_10")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    (1 to 3).foreach { i =>
      time(s"scaled-$i") {
        graft.similarity.Similarity
          .semDedupScaled(Tables.embeddings(spark, d), 0.4).count()
      }
      time(s"banded1-$i") {
        graft.similarity.Similarity
          .semDedupBanded(Tables.embeddings(spark, d), 0.4, tables = 1).count()
      }
    }
    spark.stop()
  }
}
