package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Dev scratch: BM25 cold (corpus scan) vs steady-state (cached counts)
  * timings over the salted 10×/100× smoke corpora.
  */
object BenchBm25 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    Seq(10, 100).foreach { m =>
      val dir = s"/root/repo/target/tmp/docs_salted_$m"
      val run = () => graft.text.Bm25.topK(Tables.documents(spark, dir),
        "doc_id", "text", Seq("spark", "join", "window", "hash"), 20).count()
      run() // warm jit/codegen
      spark.sqlContext.clearCache()
      time(s"bm25-cold-$m" + "x") { spark.sqlContext.clearCache(); run() }
      run() // populate cache
      time(s"bm25-steady-$m" + "x") { run() }
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
