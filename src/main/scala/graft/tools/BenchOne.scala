package graft.tools
import graft.{GraftSession, SparkEntry, Tables}
import graft.text.Shingles
import graft.functions.Num
import org.apache.spark.sql.functions._
/** Dev scratch: compare q54 formulations at a given SF. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    // current: inverted-index self-join
    time("join-based") { SparkEntry.queries("q54_ngram_jaccard")(spark, d).count() }
    // variant: collect per-shingle doc lists, expand pairs map-side
    time("expand-based") {
      val sh = Tables.documents(spark, d)
        .select(col("doc_id"), Shingles.shingles(col("text"), 3).as("sh"))
      val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
      val inv = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      val lists = inv.groupBy("s").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) >= 2)
      val pairs = lists.select(explode(
        flatten(transform(col("ds"), (x, i) =>
          transform(slice(col("ds"), i + 2, size(col("ds"))),
            y => struct(x.as("id1"), y.as("id2"))) ))).as("p"))
        .select(col("p.id1"), col("p.id2"))
      val common = pairs.groupBy("id1", "id2").agg(count(lit(1)).as("common"))
      val out = common
        .join(sizes.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
        .join(sizes.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
        .withColumn("jaccard", Num.rnd(col("common").cast("double") / (col("n1") + col("n2") - col("common")), 6))
        .filter(col("jaccard") >= 0.5)
      out.count()
    }
    spark.stop()
  }
}
