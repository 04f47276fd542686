package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.{GraftSession, SparkEntry}

/** Dev scratch: capture EVERY executed plan fired while an
  * eager-construction query builds + runs (q232/q249/q263/q373-class),
  * and print per-plan operator counts — the calibration input for
  * PlanPinSpec's listener-based pins.
  *
  * Usage: tools/run_verify.sh <sfDir> x graft.tools.EagerPlanAudit q232_...,q263_...
  */
object EagerPlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(2).split(",").toSeq
    val spark = GraftSession.builder(master = "local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new ConcurrentLinkedQueue[String]()
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    // graph loops run on the dedicated AQE-off clone (r14) — capture there too
    graft.operators.Iterative.aqeOffSession(spark).listenerManager.register(l)
    def count(p: String, m: String): Int = p.sliding(m.length).count(_ == m)
    for (n <- names) {
      plans.clear()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.count()
      org.apache.spark.graftbridge.ListenerBridge2.waitUntilEmpty(spark.sparkContext)
      println(s"=== $n: ${plans.size} captured plans")
      val it = plans.iterator()
      var i = 0
      while (it.hasNext) {
        val p = it.next()
        val marks = Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
          "Exchange SinglePartition", "BroadcastHashJoin", "SortMergeJoin",
          "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
          "TakeOrderedAndProject", "GroupTopK", "InMemoryTableScan")
          .map(m => m -> count(p, m)).filter(_._2 > 0)
        val lower = p.toLowerCase
        val expr = Seq("misragries", "pqencode", "vecsum", "signbits")
          .filter(lower.contains)
        println(s"  plan[$i]: ${marks.map { case (k, v) => s"$k=$v" }.mkString(", ")}" +
          (if (expr.nonEmpty) s" expr=${expr.mkString("/")}" else ""))
        i += 1
      }
    }
    spark.stop()
  }
}
