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
    val terms = Seq("spark", "join", "window", "hash")
    Seq(10, 100).foreach { m =>
      val dir = s"/root/repo/target/tmp/docs_salted_$m"
      val docs = Tables.documents(spark, dir)
      // cold: self-contained topK (caches + unpersists internally)
      val cold = () => graft.text.Bm25.topK(docs, "doc_id", "text", terms, 20).count()
      cold() // warm jit/codegen
      time(s"bm25-cold-$m" + "x") { cold() }
      // steady: caller-cached counts table + topKFromCounts per query —
      // the long-lived-session contract from the Bm25 scaladoc
      val tc = graft.text.Bm25.countsTable(docs, "doc_id", "text", terms).cache()
      tc.count() // populate
      time(s"bm25-steady-$m" + "x") {
        graft.text.Bm25.topKFromCounts(tc, "doc_id", terms.size, 20).count()
      }
      tc.unpersist(blocking = true)
    }
    spark.stop()
  }
}
