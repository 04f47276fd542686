package graft.tools

import graft.{GraftSession, Tables}
import graft.similarity.{IVF, IVFCentroids, PQ, PQCodebooks}
import org.apache.spark.sql.functions._

/** Dev scratch: where does q239's time go — encode, join+ADC, or rank? */
object BenchPQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pq = PQ.Model(PQCodebooks.pretrained)
    val coarse = IVF.Model(IVFCentroids.pretrained)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    val e = Tables.embeddings(spark, d)
    val q = e.filter(col("vec_id") < 16)
    (1 to 2).foreach { i =>
      time(s"encode-$i") {
        e.select(col("vec_id"), coarse.cell(col("embedding")).as("cell"),
          pq.encode(col("embedding")).as("codes")).count()
      }
      time(s"cand-adc-$i") {
        val codes = e.select(col("vec_id").as("vid"),
          coarse.cell(col("embedding")).as("cell"), pq.encode(col("embedding")).as("codes"))
        val qq = q.select(col("vec_id").as("qid"),
          explode(coarse.probeCells(col("embedding"), 4)).as("cell"),
          pq.lut(col("embedding")).as("lut"))
        codes.join(broadcast(qq), Seq("cell")).filter(col("vid") =!= col("qid"))
          .select(col("qid"), col("vid"),
            graft.functions.Num.rnd(pq.adcDist(col("lut"), col("codes")), 6).as("dist"))
          .count()
      }
      time(s"full-$i") {
        PQ.ivfPqTopK(q, e, coarse, pq, 5, 4).count()
      }
      time(s"rank-window-$i") {
        val codes = e.select(col("vec_id").as("vid"),
          coarse.cell(col("embedding")).as("cell"), pq.encode(col("embedding")).as("codes"))
        val qq = q.select(col("vec_id").as("qid"),
          explode(coarse.probeCells(col("embedding"), 4)).as("cell"),
          pq.lut(col("embedding")).as("lut"))
        val cand = codes.join(broadcast(qq), Seq("cell")).filter(col("vid") =!= col("qid"))
          .select(col("qid"), col("vid"),
            graft.functions.Num.rnd(pq.adcDist(col("lut"), col("codes")), 6).as("dist"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("dist").asc, col("vid").asc)
        cand.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w).cast("long"))
          .filter(col("rn") <= 5).count()
      }
      time(s"grouptopk-only-$i") {
        val codes = e.select(col("vec_id").as("vid"),
          coarse.cell(col("embedding")).as("cell"), pq.encode(col("embedding")).as("codes"))
        val qq = q.select(col("vec_id").as("qid"),
          explode(coarse.probeCells(col("embedding"), 4)).as("cell"),
          pq.lut(col("embedding")).as("lut"))
        val cand = codes.join(broadcast(qq), Seq("cell")).filter(col("vid") =!= col("qid"))
          .select(col("qid"), col("vid"),
            graft.functions.Num.rnd(pq.adcDist(col("lut"), col("codes")), 6).as("dist"))
        graft.plans.GroupTopK.topKPerKey(cand, Seq("qid"),
          Seq(("dist", false), ("vid", false)), 5).count()
      }
      time(s"synthetic-rank-$i") {
        import spark.implicits._
        val syn = spark.range(0, 19200)
          .select((col("id") % 16).as("qid"), col("id").as("vid"),
            (col("id") % 997).cast("double").as("dist"))
        graft.plans.GroupTopK.topKPerKey(syn, Seq("qid"),
          Seq(("dist", false), ("vid", false)), 5).count()
      }
      time(s"synthetic-window-$i") {
        val syn = spark.range(0, 19200)
          .select((col("id") % 16).as("qid"), col("id").as("vid"),
            (col("id") % 997).cast("double").as("dist"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("dist").asc, col("vid").asc)
        syn.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("rn") <= 5).count()
      }
      locally {
        val codes = e.select(col("vec_id").as("vid"),
          coarse.cell(col("embedding")).as("cell"), pq.encode(col("embedding")).as("codes"))
        val qq = q.select(col("vec_id").as("qid"),
          explode(coarse.probeCells(col("embedding"), 4)).as("cell"),
          pq.lut(col("embedding")).as("lut"))
        val cand = codes.join(broadcast(qq), Seq("cell")).filter(col("vid") =!= col("qid"))
          .select(col("qid"), col("vid"),
            graft.functions.Num.rnd(pq.adcDist(col("lut"), col("codes")), 6).as("dist"))
        val top = graft.plans.GroupTopK.topKPerKey(cand, Seq("qid"),
          Seq(("dist", false), ("vid", false)), 5)
        time(s"gtk-1st-$i") { top.count() }
        time(s"gtk-2nd-$i") { top.count() }
        time(s"gtk-3rd-$i") { top.count() }
      }
      time(s"cached-cand-rank-$i") {
        val codes = e.select(col("vec_id").as("vid"),
          coarse.cell(col("embedding")).as("cell"), pq.encode(col("embedding")).as("codes"))
        val qq = q.select(col("vec_id").as("qid"),
          explode(coarse.probeCells(col("embedding"), 4)).as("cell"),
          pq.lut(col("embedding")).as("lut"))
        val cand = codes.join(broadcast(qq), Seq("cell")).filter(col("vid") =!= col("qid"))
          .select(col("qid"), col("vid"),
            graft.functions.Num.rnd(pq.adcDist(col("lut"), col("codes")), 6).as("dist"))
          .cache()
        cand.count()
        val n = graft.plans.GroupTopK.topKPerKey(cand, Seq("qid"),
          Seq(("dist", false), ("vid", false)), 5).count()
        cand.unpersist(blocking = false)
        n
      }
    }
    spark.stop()
  }
}
