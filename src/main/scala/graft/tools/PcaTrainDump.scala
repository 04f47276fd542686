package graft.tools

import graft.{GraftSession, Tables}

/** One-off: fit PCA on the sf0.01 embeddings and print the frozen model
  * literals for similarity/PcaComponents.scala (same pattern as
  * IVFTrainDump/PQTrainDump — train offline, project at scale).
  */
object PcaTrainDump {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val k = if (args.length > 1) args(1).toInt else 8
    val spark = GraftSession.builder(master = "local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = graft.similarity.Pca.fit(Tables.embeddings(spark, d), "embedding", k)
    def arr(a: Array[Double]): String =
      "Array(" + a.map(_.toString).mkString(", ") + ")"
    println("  val mean: Array[Double] = " + arr(m.mean))
    println("  val eigenvalues: Array[Double] = " + arr(m.eigenvalues))
    println("  val components: Array[Array[Double]] = Array(")
    m.components.foreach(c => println("    " + arr(c) + ","))
    println("  )")
    spark.stop()
  }
}
