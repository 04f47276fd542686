package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dispatch-constant profiler: for each named query, run warmups then
  * timed passes and split wall time into
  *   - build: constructing the Dataset from the query closure
  *   - plan:  Catalyst analyze/optimize/physical-plan of count(df)
  *            (what every `df.count()` pass pays — count() wraps the
  *            reused Dataset in a NEW Aggregate, so planning is NOT
  *            amortized across passes despite the lazy QueryExecution)
  *   - exec:  wall time of the count() action itself
  * plus scheduled task time / task / stage / job counts from a
  * SparkListener — the exec-minus-taskTime residual is the stage
  * dispatch + AQE re-optimization constant VERDICT r11 item 1 targets.
  *
  * Usage: tools/run_verify.sh <sfDir> x graft.tools.PerfProbe q01_agg_sum,q88_embed_centroid
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(2).split(",").toSeq
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var stageCount = 0
    @volatile var jobCount = 0
    @volatile var taskCount = 0
    @volatile var taskTimeMs = 0L
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stageCount += 1
        taskCount += sc.stageInfo.numTasks
        taskTimeMs += sc.stageInfo.taskMetrics.executorRunTime
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stageLog.add(f"    stage=${si.stageId}%-4d tasks=${si.numTasks}%-3d wall=${wall / 1000.0}%.2fs taskTime=${si.taskMetrics.executorRunTime / 1000.0}%.2fs  ${si.name.takeWhile(_ != '\n').take(70)}")
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = jobCount += 1
    })

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save() // full materialization, as Bench

    val qmap = graft.SparkEntry.queries
    names.foreach { n =>
      val df = qmap(n)(spark, sfDir)
      (1 to 2).foreach(_ => run(df)) // warmup: codegen + JIT
      System.gc()
      val best = (1 to 4).map { _ =>
        stageCount = 0; jobCount = 0; taskCount = 0; taskTimeMs = 0L
        stageLog.clear()
        val t0 = System.nanoTime()
        val fresh = qmap(n)(spark, sfDir) // what eager bench passes pay
        val t1 = System.nanoTime()
        // force Catalyst analyze/optimize/physical-plan NOW so the
        // plan/exec split is real (executedPlan is the lazy val the
        // first action would otherwise pay inside `run`)
        fresh.queryExecution.executedPlan
        val t2 = System.nanoTime()
        run(fresh)
        val t3 = System.nanoTime()
        Thread.sleep(200) // let listener events drain
        ((t3 - t0) / 1e9, (t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9,
          jobCount, stageCount, taskCount, taskTimeMs)
      }.minBy(_._1)
      println(f"PROBE $n%-24s total=${best._1}%.3f build=${best._2}%.3f plan=${best._3}%.3f exec=${best._4}%.3f jobs=${best._5} stages=${best._6} tasks=${best._7} taskTime=${best._8 / 1000.0}%.3f")
      if (sys.env.contains("SPARK_GRAFT_PROBE_STAGES"))
        stageLog.forEach(s => println(s)) // last pass's stages (not min pass)
    }
    spark.stop()
  }
}
