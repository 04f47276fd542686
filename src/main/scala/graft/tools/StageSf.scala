package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Stage a replicated corpus for the large-SF bench tier: `mult` copies
  * of the sf0.1 tables with shifted ids (ScaleSmoke's staging recipe)
  * into target/tmp/sf<mult>x. Used by the dispatch-floor amortization
  * table in BASELINE.md (VERDICT r9 item 4): time the floor-bound
  * headline queries where the scan actually costs something.
  *
  * Usage: StageSf <mult>   (e.g. 100 → ~1.5 GB, "sf10-ish")
  */
object StageSf {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val spark = GraftSession.builder(master = "local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val out = s"/root/repo/target/tmp/sf${mult}x"

    def replicate(name: String, df: DataFrame, idCols: Seq[String],
                  shift: Long): Unit = {
      val p = s"$out/$name.parquet"
      if (!new java.io.File(p).exists()) {
        val copies = (0 until mult).map { k =>
          idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k * shift)))
        }
        copies.reduce(_.unionByName(_)).repartition(32)
          .write.mode(SaveMode.Overwrite).parquet(p)
        println(s"staged $name x$mult")
      }
    }
    replicate("lineitem", Tables.lineitem(spark, src), Seq("l_orderkey"), 100000000L)
    replicate("orders", Tables.orders(spark, src), Seq("o_orderkey"), 100000000L)
    replicate("documents", Tables.documents(spark, src), Seq("doc_id"), 1000000L)
    replicate("embeddings", Tables.embeddings(spark, src), Seq("vec_id"), 1000000L)
    // dims copied once (broadcast sides stay dim-sized, like production)
    Seq("customer", "region", "nation", "supplier", "part").foreach { t =>
      val p = s"$out/$t.parquet"
      if (!new java.io.File(p).exists())
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode(SaveMode.Overwrite).parquet(p)
    }
    println(s"staged: $out")
    spark.stop()
  }
}
