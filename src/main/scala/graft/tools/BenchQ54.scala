package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.Num
import graft.text.{PackedPairs, Shingles}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Dev scratch: q54 inverted index keyed by shingle STRING vs by its
  * 64-bit hash (narrower shuffle rows, cheaper group hashing).
  */
object BenchQ54 {
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

    def pipeline(keyed: org.apache.spark.sql.DataFrame): Long = {
      val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
      val lists = keyed.groupBy("s")
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) >= 2)
      val common = lists.select(explode(
          ColumnBridge.column(PackedPairs(ColumnBridge.expression(col("ds"))))).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("common"))
        .select(shiftrightunsigned(col("pk"), 32).as("id1"),
          col("pk").bitwiseAND(lit(0xffffffffL)).as("id2"), col("common"))
      common
        .join(sizes.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
        .join(sizes.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
        .withColumn("jaccard", Num.rnd(
          col("common").cast("double") / (col("n1") + col("n2") - col("common")), 6))
        .filter(col("jaccard") >= 0.5)
        .count()
    }

    val byString = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val byHash = sh.select(col("doc_id"), explode(col("sh")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("s"))
    (1 to 3).foreach { i =>
      time(s"string-key-$i") { pipeline(byString) }
      time(s"hash-key-$i") { pipeline(byHash) }
    }
    spark.stop()
  }
}
