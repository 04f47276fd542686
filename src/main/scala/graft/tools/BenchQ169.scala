package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratch: decompose q169's adaptive singleton gate on a given
  * dir — (a) ungated pipeline, (b) the HLL stats sketch alone, (c) the
  * exact dup-count pass alone, (d) gated pipeline — to pick the gate
  * decision mechanism with numbers rather than guesses.
  */
object BenchQ169 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val k = 20
    val g = Tables.documents(spark, d)
      .filter(length(col("text")) >= k)
      .select(col("doc_id"), graft.text.Fingerprint.winnowSetLong(
        col("text"), k, 1).as("hs"))
      .cache()
    println(s"docs=${g.count()}")
    val sizes = g.select(col("doc_id"), size(col("hs")).as("ng"))
    val inv = g.select(col("doc_id"), explode(col("hs")).as("h"))

    def rest(gated: DataFrame): Long = {
      val lists = gated.groupBy("h")
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) >= 2)
      val common = lists.select(explode(
          org.apache.spark.sql.graftbridge.ColumnBridge.column(
            graft.text.PackedPairs(
              org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("ds"))))).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("n_shared"))
        .select(shiftrightunsigned(col("pk"), 32).as("id1"),
          col("pk").bitwiseAND(lit(0xffffffffL)).as("id2"), col("n_shared"))
      common
        .join(sizes.select(col("doc_id").as("id1"), col("ng").as("ng1")), "id1")
        .join(sizes.select(col("doc_id").as("id2"), col("ng").as("ng2")), "id2")
        .filter(col("n_shared") >= 25)
        .count()
    }

    (1 to 3).foreach { pass =>
      println(s"--- pass $pass")
      time("ungated")(rest(inv))
      val st = time("stats-hll")(
        inv.agg(count(lit(1)).as("rows"),
          approx_count_distinct(col("h")).as("grams")).head())
      println(s"  rows=${st.getLong(0)} grams=${st.getLong(1)} " +
        f"ratio=${st.getLong(1).toDouble / st.getLong(0)}%.3f")
      val dups = time("dup-count-pass") {
        val x = inv.groupBy("h").agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2).select("h").cache()
        x.count(); x
      }
      time("gated") {
        val bloom = graft.text.BloomGate.build(dups, col("h"), dups.count())
        rest(inv.filter(graft.text.BloomGate.mightContain(bloom, col("h"))))
      }
      dups.unpersist()
    }
    spark.stop()
  }
}
