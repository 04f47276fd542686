package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Pca, PcaComponents, Similarity}

class PcaSpec extends SparkSpec {

  test("eigSym solves a known symmetric matrix exactly") {
    // [[2,1],[1,2]] → eigenvalues 3, 1; vectors (1,1)/√2 and (−1,1)/√2
    val (evals, evecs) = Pca.eigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-12)
    assert(math.abs(evals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(evecs(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // sign convention: largest-|coordinate| entry positive (first on tie)
    assert(evecs(1)(0) > 0 || evecs(1)(1) > 0)
    assert(math.abs(math.abs(evecs(1)(0)) - r) < 1e-12)
  }

  test("fit produces orthonormal components with descending eigenvalues") {
    val m = Pca.fit(Tables.embeddings(spark, sf), "embedding", 6)
    assert(m.components.length === 6)
    assert(m.eigenvalues.length === 6)
    // descending, non-negative
    m.eigenvalues.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) }
    assert(m.eigenvalues.last >= -1e-12)
    // orthonormal rows
    for (i <- m.components.indices; j <- i until m.components.length) {
      val d = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"⟨w$i,w$j⟩ = $d")
    }
  }

  test("projection variance matches the eigenvalue (population ÷n)") {
    val e = Tables.embeddings(spark, sf)
    val m = Pca.fit(e, "embedding", 3)
    val proj = Pca.project(e, "embedding", m)
    val stats = proj.agg(
      var_pop(col("p0")), var_pop(col("p1")), var_pop(col("p2"))).head()
    (0 until 3).foreach { d =>
      val v = stats.getDouble(d)
      val ev = m.eigenvalues(d)
      assert(math.abs(v - ev) / ev < 1e-6, s"var(p$d)=$v vs λ=$ev")
    }
  }

  test("top eigenvalue dominates every per-dimension variance") {
    // λ₁ = max variance over ALL unit directions ≥ max coordinate variance
    val e = Tables.embeddings(spark, sf)
    val m = Pca.fit(e, "embedding", 1)
    val dim = 64
    val maxCoordVar = (0 until dim).map { j =>
      e.select(var_pop(element_at(col("embedding"), j + 1).cast("double")))
        .head().getDouble(0)
    }.max
    assert(m.eigenvalues(0) >= maxCoordVar - 1e-12)
  }

  test("frozen PcaComponents stay orthonormal and projection is scan-stage") {
    val comp = PcaComponents.components
    for (i <- comp.indices; j <- i until comp.length) {
      val d = comp(i).zip(comp(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9)
    }
    val model = Pca.Model(PcaComponents.mean, PcaComponents.eigenvalues, comp)
    val plan = Pca.project(Tables.embeddings(spark, sf), "embedding", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("native projection equals a driver-side replay") {
    val model = Pca.Model(PcaComponents.mean, PcaComponents.eigenvalues,
      PcaComponents.components)
    val e = Tables.embeddings(spark, sf).filter(col("vec_id") < 8)
    val got = Pca.project(e, "embedding", model)
      .select(col("vec_id"), col("p0"), col("p7")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val raw = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    raw.foreach { case (id, v) =>
      def replay(d: Int): Double =
        v.indices.foldLeft(0.0)((acc, j) =>
          acc + v(j).toDouble * model.components(d)(j)) - model.meanDots(d)
      val (g0, g7) = got(id)
      assert(math.abs(g0 - replay(0)) < 1e-9)
      assert(math.abs(g7 - replay(7)) < 1e-9)
    }
  }
}
