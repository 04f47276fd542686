package graft.tools

import graft.{GraftSession, Tables}

/** One-off: train IVF KMeans on the sf0.01 embeddings and print the
  * centroids as a Scala literal for similarity/IVFCentroids.scala.
  */
object IVFTrainDump {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder(master = "local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = graft.similarity.IVF.fit(Tables.embeddings(spark, d), k = 8)
    println("  val pretrained: Array[Array[Double]] = Array(")
    m.centroids.foreach { c =>
      println("    Array(" + c.map(_.toString).mkString(", ") + "),")
    }
    println("  )")
    spark.stop()
  }
}
