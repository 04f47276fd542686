package graft.tools
import graft.{GraftSession, SparkEntry}
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}
