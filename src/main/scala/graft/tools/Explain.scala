package graft.tools
import graft.{GraftSession, SparkEntry}
/** Dev tool: print formatted plans for selected queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sf = "/root/testdata/sf0.01"
    args.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
