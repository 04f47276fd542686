package graft.tools

import graft.GraftSession
import graft.queries.TextQueries

/** Dev scratch: q54 pair counting — streaming primitive-map kernel vs
  * explode+hashagg, alternated in one session (min of 3 each).
  */
object BenchQ54K {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/repo/target/tmp/sf1ish")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both
    TextQueries.exactPairsKernel(spark, d).count()
    TextQueries.exactPairs(spark, d).count()
    var k = Double.MaxValue; var e = Double.MaxValue
    (1 to 3).foreach { _ =>
      k = math.min(k, time(TextQueries.exactPairsKernel(spark, d).count()))
      e = math.min(e, time(TextQueries.exactPairs(spark, d).count()))
    }
    println(f"kernel:  $k%.2fs")
    println(f"explode: $e%.2fs")
    spark.stop()
  }
}
