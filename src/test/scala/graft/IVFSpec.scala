package graft

import org.apache.spark.sql.functions._
import graft.similarity.{IVF, Similarity}

class IVFSpec extends SparkSpec {

  test("IVF ANN recall@5 vs brute force") {
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") < 20)
    val model = IVF.fit(e, k = 8)
    assert(model.k === 8)

    val ivf = IVF.topK(queries, e, model, k = 5, nprobe = 4)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(queries, e, 5)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (ivf & brute).size.toDouble / brute.size
    info(s"IVF recall@5 (k=8, nprobe=4): $recall")
    assert(recall > 0.5, s"recall $recall too low")
    // determinism: same seed → same cells
    val m2 = IVF.fit(e, k = 8)
    assert(model.centroids.map(_.toSeq).toSeq === m2.centroids.map(_.toSeq).toSeq)
  }

  test("native NearestCells ≡ composed array_min/array_sort spelling") {
    val e = Tables.embeddings(spark, sf)
    val model = IVF.fit(e, k = 8)
    // cell: argmin (nprobe = 1)
    val cells = e.select(
      model.cell(col("embedding")).as("n"),
      model.cellComposed(col("embedding")).as("c"))
    assert(cells.filter(col("n") =!= col("c")).count() === 0L)
    // probeCells: full sorted prefix, incl. nprobe > k clamping
    for (np <- Seq(2, 4, 8, 11)) {
      val probes = e.select(
        model.probeCells(col("embedding"), np).as("n"),
        model.probeCellsComposed(col("embedding"), np).as("c"))
      assert(probes.filter(not(col("n") <=> col("c"))).count() === 0L, s"nprobe=$np")
    }
    // null input → null out on both
    val nulls = e.select(lit(null).cast("array<float>").as("embedding"))
      .select(model.cell(col("embedding")).as("n"),
        model.probeCells(col("embedding"), 3).as("p"))
    assert(nulls.filter(col("n").isNotNull || col("p").isNotNull).count() === 0L)
  }
}
