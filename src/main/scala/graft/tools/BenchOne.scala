package graft.tools
import graft.{GraftSession, Tables}
import graft.text.{PackedPairs, Shingles}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
/** Dev scratch: hash-agg vs sort-based run-length counting for q54's pair stage. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    val sh = Tables.documents(spark, d)
      .select(col("doc_id"), Shingles.shingles(col("text"), 3).as("sh")).cache()
    sh.count()
    val lists = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("s").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
    val pk = lists.select(explode(ColumnBridge.column(
      PackedPairs(ColumnBridge.expression(col("ds"))))).as("pk")).cache()
    pk.count()
    (1 to 2).foreach { i =>
      time(s"hash-agg-$i") { pk.groupBy("pk").agg(count(lit(1)).as("c")).count() }
      time(s"sort-count-$i") {
        pk.as[Long].repartition(32, col("pk"))
          .sortWithinPartitions("pk")
          .mapPartitions { it =>
            new Iterator[(Long, Long)] {
              var cur = 0L; var cnt = 0L; var has = false
              var nextOut: Option[(Long, Long)] = None
              def advance(): Unit = {
                while (nextOut.isEmpty && it.hasNext) {
                  val v = it.next()
                  if (!has) { cur = v; cnt = 1; has = true }
                  else if (v == cur) cnt += 1
                  else { nextOut = Some((cur, cnt)); cur = v; cnt = 1 }
                }
                if (nextOut.isEmpty && has) { nextOut = Some((cur, cnt)); has = false }
              }
              def hasNext: Boolean = { if (nextOut.isEmpty) advance(); nextOut.nonEmpty }
              def next(): (Long, Long) = { val r = nextOut.get; nextOut = None; r }
            }
          }.toDF("pk", "c").count()
      }
    }
    spark.stop()
  }
}
