package graft.tools

import org.apache.spark.sql.functions._

/** Probe-only scaling of the persisted gram index (VERDICT r12 item 6):
  * the in-tier q431 smoke times BUILD+probe together, so the probe
  * join's exchange was assumed, not measured. Here the index is built
  * ONCE per multiplier and persisted PARTITIONED BY the 2-hex gram-hash
  * prefix (256 disk partitions — the layout a 100-TB deployment would
  * keep so probe-side prefix pruning and co-located bucket reads are
  * possible), then the probe alone is warmed and timed.
  *
  * Usage: GramIndexSmoke [srcDir] — runs 10× and 100× salted tiers.
  */
object GramIndexSmoke {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    val L = 8
    Seq(10, 100).foreach { m =>
      val dir = ScaleSmoke.stageSalted(spark, src, m)
      val docs = graft.Tables.documents(spark, dir)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val idxPath = s"${Staging.root}/gram_idx_part_$m"
      if (!new java.io.File(idxPath).exists()) {
        val t0 = System.nanoTime()
        graft.text.GramIndex.build(corpus, "doc_id", "text", L)
          .withColumn("gp", substring(col("gram_md5"), 1, 2))
          .write.partitionBy("gp")
          .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(idxPath)
        println(f"build+persist@${m}x: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      val index = spark.read.parquet(idxPath).drop("gp")
      def probe(): Long =
        graft.text.GramIndex.probe(index, batch, "doc_id", "text", L).count()
      probe() // warm
      System.gc(); Thread.sleep(500)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = probe()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"probe@${m}x: min=${times.map(_._1).min}%.2fs rows=${times.head._2}")
    }
    spark.stop()
  }
}
