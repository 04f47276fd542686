package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.text.{Shingles, SimHash}

/** Throwaway inspector: print simhash64 of specific doc ids. */
object SimHashDebug {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val ids = if (args.length > 1) args(1).split(",").map(_.toLong) else Array(120L, 332L)
    val spark = GraftSession.builder(master = "local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.documents(spark, d)
      .filter(col("doc_id").isin(ids.map(x => x: Any): _*))
      .select(col("doc_id"),
        SimHash.simhash(Shingles.shingles(col("text"), 3)).as("sh"),
        size(Shingles.shingles(col("text"), 3)).as("nsh"))
      .collect()
      .foreach(r => println(s"${r.getLong(0)} ${java.lang.Long.toHexString(r.getLong(1))} nsh=${r.getInt(2)}"))
    spark.stop()
  }
}
