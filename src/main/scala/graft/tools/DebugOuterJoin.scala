package graft.tools

import graft.GraftSession

/** Dev scratch: batch-by-batch watermark trace for the streaming outer
  * interval join (q252).
  */
object DebugOuterJoin {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"BATCH ${p.batchId}: in=${p.numInputRows} " +
          s"wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")} " +
          s"sink=${p.sink.numOutputRows}")
        p.sources.zipWithIndex.foreach { case (s, i) =>
          println(s"  src$i in=${s.numInputRows} start=${s.startOffset} end=${s.endOffset}")
        }
      }
    })
    val out = graft.streaming.EventStreams.streamStreamOuterJoin(spark, d)
    println("TOTAL=" + out.count())
    Thread.sleep(2000)
    spark.stop()
  }
}
