package graft.tools

import graft.{GraftSession, Tables}

/** One-off: train PQ per-subspace KMeans codebooks on the sf0.01
  * embeddings and print them as a Scala literal for
  * similarity/PQCodebooks.scala (m=8 subspaces × ksub=16 codes ×
  * dsub=8 dims over the 64-dim corpus).
  */
object PQTrainDump {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder(master = "local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = graft.similarity.PQ.fit(Tables.embeddings(spark, d), m = 8, ksub = 16)
    println("  val pretrained: Array[Array[Array[Double]]] = Array(")
    m.codebooks.foreach { book =>
      println("    Array(")
      book.foreach { c =>
        println("      Array(" + c.map(_.toString).mkString(", ") + "),")
      }
      println("    ),")
    }
    println("  )")
    spark.stop()
  }
}
