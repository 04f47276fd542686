package graft


/** Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). Each query is fully executed
  * via a count() action over its result (materializes every operator in
  * the plan; AQE on).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.benchNames
    val qmap = SparkEntry.queries
    // Full warmup pass: JIT + codegen + parquet footer caches. The timed
    // pass then measures engine throughput, not first-call compilation.
    names.foreach { n =>
      try qmap(n)(spark, sfDir).count() catch { case _: Throwable => }
    }

    val results = names.map { name =>
      val t0 = System.nanoTime()
      try { qmap(name)(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
