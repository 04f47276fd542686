package graft.tools

/** Measures the irreducible per-action constants of this local[32] setup:
  * a 1-task job, a 2-stage tiny aggregation (1 exchange), and a tiny
  * parquet scan-agg — with AQE on vs off — to bound what any sub-second
  * headline query can possibly cost beyond its real work.
  */
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(body: => Unit): Unit = {
      (1 to 30).foreach(_ => body) // deep warm: JIT the scheduler paths too
      val xs = (1 to 20).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"FLOOR $label%-40s min=${xs.head}%.4fs med=${xs(xs.size / 2)}%.4fs max=${xs.last}%.4fs")
    }

    // Decompose the 1-task-job constant: event timestamps from the
    // scheduler tell us where submit→launch→finish→jobEnd time goes.
    @volatile var jSub = 0L; @volatile var tLaunch = 0L; @volatile var tFin = 0L; @volatile var jEnd = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jSub = e.time
      override def onTaskStart(e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit = tLaunch = e.taskInfo.launchTime
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = tFin = e.taskInfo.finishTime
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = jEnd = e.time
    })
    val rdd1 = spark.sparkContext.parallelize(1 to 10, 1)
    time("rdd 1-task job (reused rdd)")(rdd1.count())
    Thread.sleep(300)
    println(s"DECOMP submit->launch=${tLaunch - jSub}ms run=${tFin - tLaunch}ms finish->jobEnd=${jEnd - tFin}ms")
    time("rdd 1-task job")(spark.sparkContext.parallelize(1 to 10, 1).count())
    time("df range count (1 stage)")(spark.range(100).toDF("x").count())
    time("df groupBy agg (2 stage)")(
      spark.range(100).toDF("x").groupBy(($"x" % 3).as("k")).count().count())
    val scan = spark.read.parquet(s"$sfDir/nation.parquet")
    time("parquet scan-agg")(scan.groupBy($"n_regionkey").count().count())

    // q01 kernel variants: decimal(12,2) sum (current) vs long-cents sum
    // (exact, compact) vs raw double sum (inexact floor).
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_returnflag", $"l_linestatus", $"l_quantity", $"l_extendedprice")
    import org.apache.spark.sql.functions._
    def runShow(df: org.apache.spark.sql.DataFrame): Unit = { df.collect(); () }
    time("q01 decimal sum")(runShow(
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(graft.functions.Num.sumMoney($"l_quantity").as("a"),
          graft.functions.Num.sumMoney($"l_extendedprice").as("b"), count(lit(1)))))
    time("q01 long-cents sum")(runShow(
      li.groupBy("l_returnflag", "l_linestatus")
        .agg((sum(rint($"l_quantity" * 100).cast("long")) / 100.0).as("a"),
          (sum(rint($"l_extendedprice" * 100).cast("long")) / 100.0).as("b"), count(lit(1)))))
    time("q01 double sum")(runShow(
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum($"l_quantity").as("a"), sum($"l_extendedprice").as("b"), count(lit(1)))))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("df groupBy agg AQE-off")(
      spark.range(100).toDF("x").groupBy(($"x" % 3).as("k")).count().count())
    time("parquet scan-agg AQE-off")(scan.groupBy($"n_regionkey").count().count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
