package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Dev scratch: isolate localCheckpoint overhead vs plain count on the
  * q373 path (r11 cache-ownership change regressed the bench row).
  */
object ProbeCkpt {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
    }
    // per-job wall times via listener
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = starts.remove(j.jobId)
        if (st != null) jobs.add((j.jobId, System.nanoTime() - st._1, st._2))
      }
    })
    (1 to 3).foreach { i =>
      jobs.clear()
      time(s"pagerank-$i") {
        graft.operators.PageRank.run(
          graft.operators.PageRank.tradeEdges(spark, d), "cust", "supp", 3).count()
      }
      org.apache.spark.graftbridge.ListenerBridge2.waitUntilEmpty(spark.sparkContext)
      val it = jobs.iterator()
      while (it.hasNext) { val (id, ns, desc) = it.next()
        println(f"    job $id: ${ns / 1e9}%.3fs ${desc.take(60)}") }
    }
    spark.stop()
  }
}
