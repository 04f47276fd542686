package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: print executed-plan summaries for a list of queries
  * (shuffle/broadcast/scan markers — the plan-audit evidence recorded
  * in PLANS.md).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    // invoked via run_verify.sh: args = (sfDir, outDir-ignored, names)
    val names = args.drop(2).headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q327_kmv_setops"))
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(s, d)
      val plan = df.queryExecution.executedPlan.toString
      val counts = Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "BroadcastExchange", "BroadcastHashJoin",
        "BroadcastNestedLoopJoin", "SortMergeJoin", "ShuffledHashJoin",
        "CartesianProduct", "GroupTopKExec", "TakeOrderedAndProject",
        "WholeStageCodegen")
        .map(k => k -> plan.sliding(k.length).count(_ == k))
        .filter(_._2 > 0)
      println(s"=== $n: ${counts.map { case (k, v) => s"$k=$v" }.mkString(", ")}")
      val scans = plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema")).take(6)
      scans.foreach(l => println("    " + l.trim.take(160)))
    }
    s.stop()
  }
}
