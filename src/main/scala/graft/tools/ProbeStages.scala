package graft.tools

import org.apache.spark.scheduler._

/** Per-stage decomposition of one registry query under the bench
  * harness (reused Dataset, noop-sink save): prints each stage's
  * wall-clock (submission→completion), task count, and summed task
  * time for the LAST timed pass, plus the gaps between stages — the
  * driver-side constant the sf0.1 floor set pays per exchange.
  *
  * Usage: ProbeStages <queryName> [passes]  (sfDir from
  * SPARK_GRAFT_SF_DIR, defaults sf0.1)
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val passes = args.drop(1).find(_.forall(_.isDigit)).map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, name: String, sub: Long, done: Long,
                  tasks: Int, taskMs: Long)
    val stages = new scala.collection.mutable.ArrayBuffer[St]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (record) {
          val i = e.stageInfo
          stages += St(i.stageId, i.name.takeWhile(_ != '\n'),
            i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L),
            i.numTasks, i.taskMetrics.executorRunTime)
        }
    })

    val eager = args.contains("eager")
    lazy val df0 = graft.SparkEntry.queries(name)(spark, sfDir)
    def run(): Unit = {
      val df = if (eager) graft.SparkEntry.queries(name)(spark, sfDir) else df0
      df.write.format("noop").mode("overwrite").save()
    }
    (1 to 2).foreach(_ => run())
    System.gc(); Thread.sleep(500)

    var best = Double.MaxValue
    (1 to passes).foreach { p =>
      stages.clear()
      record = true
      val t0 = System.nanoTime()
      run()
      val dt = (System.nanoTime() - t0) / 1e9
      record = false
      best = math.min(best, dt)
      Thread.sleep(200) // let stage-completed events drain
      if (p == passes) {
        println(f"== $name pass $p total=$dt%.3fs (best=$best%.3fs)")
        val ss = stages.sortBy(_.sub).toSeq
        var prevDone = 0L
        ss.foreach { s =>
          val gap = if (prevDone == 0) 0 else s.sub - prevDone
          prevDone = math.max(prevDone, s.done)
          println(f"  stage ${s.id}%4d wall=${s.done - s.sub}%5dms gapBefore=$gap%5dms tasks=${s.tasks}%3d taskSum=${s.taskMs}%5dms  ${s.name}")
        }
        val wall = ss.map(s => s.done - s.sub).sum
        println(f"  stages=${ss.size} stageWallSum=${wall}ms (total incl. planning/driver = ${(best * 1000).toInt}ms)")
      }
    }
    spark.stop()
  }
}
