package graft


/** Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). Each query is fully executed
  * via a `noop`-sink write (materializes EVERY output column; AQE on).
  *
  * Why not count(): `df.count()` wraps the query in a new Aggregate and
  * Catalyst then PRUNES everything the count doesn't need — q01's sums
  * collapsed to `SELECT DISTINCT keys`, joins dropped their payload
  * columns. The DuckDB baseline fetches full rows, so count()-timed
  * numbers under-measured Spark (discovered r12). The noop DSv2 sink
  * consumes every row/column in the executors with no driver fetch —
  * the honest analogue of DuckDB's fetchall().
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_BENCH_NAMES overrides the headline set — used for the
    // paired heavy-operator measurements recorded in BASELINE.md
    // (driver runs leave it unset and get the headline set).
    val names = sys.env.get("SPARK_GRAFT_BENCH_NAMES")
      .map(_.split(",").toSeq).getOrElse(SparkEntry.benchNames)
    val qmap = SparkEntry.queries
    // Build each query's Dataset ONCE and re-execute the same instance in
    // every pass: QueryExecution is a lazy val, so analysis/optimization/
    // physical planning are paid once and the passes measure execution —
    // the same steady-state the DuckDB baseline reports (DuckDB's parse
    // cost is microseconds; Spark's planning is 0.1-0.3s per query and
    // would otherwise swamp the sub-second queries).
    // Full materialization of every column, executor-side (see scaladoc).
    // Each save() builds a fresh physical plan over the reused logical
    // plan, so passes re-run shuffles (no stage reuse) and pay the same
    // per-pass planning DuckDB pays (its parse+plan, just bigger).
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val dfs: Map[String, org.apache.spark.sql.DataFrame] =
      names.flatMap { n =>
        try Some(n -> qmap(n)(spark, sfDir)) catch { case _: Throwable => None }
      }.toMap
    // Two full warmup passes: the first pays codegen compilation and
    // parquet footer reads, the second lets C2 finish JITing the
    // generated code. The timed passes then measure steady-state engine
    // throughput, not compilation.
    (1 to 2).foreach { _ =>
      names.foreach { n =>
        try dfs.get(n).foreach(run) catch { case _: Throwable => }
      }
    }
    // Warmup leaves a transient behind it: the ContextCleaner is still
    // dereferencing two passes' worth of broadcasts/shuffles and the heap
    // is full of their garbage, which lands squarely on whichever queries
    // run first in the timed pass. Collect and settle before timing.
    System.gc()
    Thread.sleep(2000)

    // Per-query minimum over `passes` full timed passes. A single pass is
    // hostage to whatever else the machine is doing during each query's
    // slot (measured r2: the first timed queries inflated 6-10x under
    // harness contention with unchanged plans); the min across passes is
    // the standard steady-state estimator and is what the DuckDB baseline
    // (best-of-warm-runs) reports too. A query that throws must NOT be
    // reported as a normal timing (its time-to-failure looks like a fast
    // success); a query that fails every pass is emitted explicitly as
    // null and the exit code is nonzero.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "4").toInt
    // Queries whose CONSTRUCTION executes the algorithm (iterative
    // graph ranks materialize per iteration; driver-collected models /
    // sketches / greedy selections run Spark jobs before a Dataset
    // exists).  Reusing their instance would time only the final
    // cached projection while the DuckDB oracle replays the whole
    // computation per pass — so these rebuild per timed pass.  The
    // constant-size two-phase-scan carries elsewhere stay amortized
    // (bounded driver state, planning-like).
    val eagerNames = Set(
      "q232_heavy_hitters", "q240_bm25",
      "q260_bigram_lm", "q263_pagerank", "q266_label_prop", "q268_ppr",
      "q281_survivorship", "q287_mmr_diversity", "q294_hits",
      // corpus count() at construction derives the cell count
      "q373_semdedup_scaled")
    val best = collection.mutable.Map[String, Double]()
    (1 to passes).foreach { _ =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        try {
          if (eagerNames.contains(name)) run(qmap(name)(spark, sfDir))
          else run(dfs(name))
          val dt = (System.nanoTime() - t0) / 1e9
          best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
        } catch {
          case e: Throwable =>
            Console.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
        }
      }
    }
    val qs = names.map { k =>
      "\"" + k + "\":" + best.get(k).map(v => f"$v%.3f").getOrElse("null")
    }.mkString("{", ",", "}")
    val failed = names.filterNot(best.contains).map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = names.flatMap(best.get).sum
    // "harness" stamps the measurement contract so cross-round totals are
    // self-describing: "noop-v2" = full-materialization noop-sink writes
    // (r12+); r11-and-earlier files carry no field and were count()-timed
    // (Catalyst pruned unreferenced columns) — NOT comparable.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","harness":"noop-v2","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (!names.forall(best.contains)) sys.exit(1)
  }
}
