package graft.tools
import graft.{GraftSession, Tables}
import graft.text.{ExactNearDup, Shingles, PackedPairs}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    val sh = Tables.documents(spark, d)
      .select(col("doc_id"), Shingles.shingles(col("text"), 3).as("sh")).cache()
    sh.count()
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val dfreq = inv.groupBy("s").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("doc_id")
    val ranked = inv.join(dfreq, "s")
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("rk", row_number().over(byDoc.orderBy(col("df"), col("s"))))
    time("ranked") { ranked.count() }
    val prefix = ranked.filter(col("rk") <= col("n") - ceil(lit(0.499999) * col("n")) + 1)
    time("prefix") { prefix.count() }
    val lists = prefix.groupBy("s")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
    time("lists") { lists.count() }
    val cand = lists.select(explode(ColumnBridge.column(
        PackedPairs(ColumnBridge.expression(col("ds"))))).as("pk")).distinct()
    time("cand") { cand.count() }
    time("full q54 prefix impl") { ExactNearDup.pairs(Tables.documents(spark, d), "doc_id", "text", 3, 0.5).count() }
    spark.stop()
  }
}
