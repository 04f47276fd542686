package graft.tools

import graft.{GraftSession, Tables}

/** One-off: fit the BPE merge table on the sf0.01 documents sample and
  * print the frozen literal for text/BpeMerges.scala (the IVFCentroids
  * pattern: train offline on a sample, assign/encode at any scale).
  */
object BpeTrainDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val n = if (args.nonEmpty) args(0).toInt else 64
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val model = graft.text.Bpe.fit(docs, "doc_id", "text", n)
    println("  val pretrained: Seq[(String, String)] = Seq(")
    model.merges.foreach { case (x, y) =>
      println(s"""    ("$x", "$y"),""")
    }
    println("  )")
    spark.stop()
  }
}
