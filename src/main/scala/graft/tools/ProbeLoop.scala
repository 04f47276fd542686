package graft.tools

/** Tight loop of one small DataFrame action, for attaching a profiler
  * (JFR) to find where the per-action driver constant goes.
  */
object ProbeLoop {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = spark.range(100).toDF("x").groupBy(($"x" % 3).as("k")).count()
    (1 to 20).foreach(_ => df.count()) // warm
    val n = args.lift(2).map(_.toInt).getOrElse(300)
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => df.count())
    println(f"LOOP $n actions in ${(System.nanoTime() - t0) / 1e9}%.2fs = ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/action")
    spark.stop()
  }
}
