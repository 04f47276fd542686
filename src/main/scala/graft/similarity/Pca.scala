package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA for the embedding column — the dimensionality
  * reduction every 100 TB ANN/SemDeDup pipeline runs before indexing
  * (beyond the reference's surface; SURVEY §2.12).
  *
  * Fit is ONE scan: each partition accumulates (n, Σx, Σxxᵀ) for the
  * 64-dim vectors (a 64×64 upper triangle = 2080 doubles — constant
  * size regardless of row count), merged with treeReduce; the 64×64
  * covariance eigendecomposition runs on the driver in O(d³) — the
  * classic tall-skinny split (data-parallel Gram, driver-side eigen),
  * identical cost shape at any corpus size. No shuffle of row data at
  * all.
  *
  * Like IVF/PQ/BPE, the production pattern is train-on-a-sample then
  * project-at-scale: [[PcaComponents]] freezes a model fit on the
  * sf0.01 corpus (tools/PcaTrainDump), and [[project]] is a pure
  * scan-stage map using the native dot-product kernel. The projection
  * is formulated as `dot(x, w_d) − ⟨mean, w_d⟩` with the mean term
  * folded into one literal constant per output dim, so an oracle can
  * replay the identical double arithmetic from the same literals.
  */
object Pca {

  case class Model(mean: Array[Double], eigenvalues: Array[Double],
                   components: Array[Array[Double]]) {
    /** ⟨mean, w_d⟩ per output dim, left-folded in index order — the
      * single constant both the Spark plan and the oracle inline.
      */
    lazy val meanDots: Array[Double] =
      components.map(w => w.indices.foldLeft(0.0)((acc, j) => acc + mean(j) * w(j)))
  }

  /** Fit a k-component PCA of `embCol` (array<float>) with one pass
    * over the data. Population covariance (÷n); components are unit
    * eigenvectors of the covariance, sorted by eigenvalue descending,
    * sign-normalized so each vector's largest-|coordinate| entry is
    * positive (Jacobi rotations are sign-ambiguous).
    */
  def fit(df: DataFrame, embCol: String, k: Int): Model = {
    val dim = df.select(size(col(embCol))).head().getInt(0)
    require(k <= dim, s"k=$k exceeds dim=$dim")
    val (n, s, m) = df.select(col(embCol)).rdd.mapPartitions { it =>
      var cnt = 0L
      val sums = new Array[Double](dim)
      val gram = Array.ofDim[Double](dim, dim)
      it.foreach { r =>
        val v = r.getSeq[Float](0)
        cnt += 1
        var i = 0
        while (i < dim) {
          val xi = v(i).toDouble
          sums(i) += xi
          var j = i
          while (j < dim) { gram(i)(j) += xi * v(j).toDouble; j += 1 }
          i += 1
        }
      }
      Iterator.single((cnt, sums, gram))
    }.treeReduce { case ((n1, s1, m1), (n2, s2, m2)) =>
      var i = 0
      while (i < dim) {
        s1(i) += s2(i)
        var j = i
        while (j < dim) { m1(i)(j) += m2(i)(j); j += 1 }
        i += 1
      }
      (n1 + n2, s1, m1)
    }
    require(n > 1, "PCA fit needs at least 2 rows")
    val mean = s.map(_ / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val mij = if (i <= j) m(i)(j) else m(j)(i)
      mij / n - mean(i) * mean(j)
    }
    val (evals, evecs) = eigSym(cov)
    Model(mean, evals.take(k), evecs.take(k))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues desc, row-major eigenvectors), each vector
    * sign-normalized. Deterministic for a given input; O(d³) on the
    * driver — only ever used on d×d covariance with tiny d.
    */
  private[graft] def eigSym(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < 100 && offDiag() > 1e-20) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val sgn = if (theta >= 0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var i = 0
            while (i < n) {
              val aip = a(math.min(i, p))(math.max(i, p))
              val aiq = a(math.min(i, q))(math.max(i, q))
              if (i != p && i != q) {
                a(math.min(i, p))(math.max(i, p)) = aip * c - aiq * sn
                a(math.min(i, q))(math.max(i, q)) = aip * sn + aiq * c
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = vip * c - viq * sn
              v(i)(q) = vip * sn + viq * c
              i += 1
            }
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = app * c * c - 2.0 * apq * sn * c + aqq * sn * sn
            a(q)(q) = app * sn * sn + 2.0 * apq * sn * c + aqq * c * c
            a(p)(q) = 0.0
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val pairs = (0 until n).map { j =>
      val vec = Array.tabulate(n)(i => v(i)(j))
      // sign convention: entry of largest |value| (first on tie) positive
      val piv = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      val flipped = if (vec(piv) < 0) vec.map(-_) else vec
      (a(j)(j), flipped)
    }.sortBy(-_._1)
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** Scan-stage projection onto the model's components: one output
    * column per component, `dot(x, w_d) − meanDots(d)`, via the native
    * [[DotProduct]] kernel — codegen'd, zero shuffles, linear in rows.
    */
  def projectCols(embCol: Column, model: Model): Seq[Column] =
    model.components.indices.map { d =>
      Similarity.dot(embCol, typedlit(model.components(d).toSeq)) -
        lit(model.meanDots(d))
    }

  /** Project `df`'s embedding column to `p0..p{k-1}` (unrounded). */
  def project(df: DataFrame, embCol: String, model: Model): DataFrame = {
    val cols = projectCols(col(embCol), model).zipWithIndex.map {
      case (c, d) => c.as(s"p$d")
    }
    df.select(df.columns.map(col).toIndexedSeq ++ cols: _*)
  }

  /** PCA-prefiltered ANN with exact rerank: the pair scan runs in the
    * k′-dim PROJECTED space (k′ multiplies per pair instead of the full
    * dim — here 8 vs 64), a bounded GroupTopK heap keeps `shortlist`
    * candidates per query below the exchange, and only those rows
    * re-fetch their float vectors (point-lookup hash join, |Q|·shortlist
    * rows — never a corpus re-scan) for exact squared-L2 reranking.
    * Same production shape as [[PQ.ivfPqRerankTopK]], with the PCA
    * subspace as the coarse metric: projected L2 lower-bounds true L2
    * (orthonormal projection), so the shortlist misses only vectors
    * whose residual-space distance dominates. Shortlist sizing scales
    * inversely with the model's explained-variance ratio — on a
    * flat-spectrum (near-isotropic) corpus the subspace orders
    * neighbors weakly and the shortlist must grow accordingly
    * (quantified in PcaSpec against the random-shortlist baseline).
    *
    * Distances on both stages are the literal-replayable
    * `⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩` shape rounded at 6dp, so a SQL oracle
    * rebuilds the identical shortlist and ranking (q258).
    */
  def rerankTopK(queries: DataFrame, corpus: DataFrame, model: Model,
                 k: Int, shortlist: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def proj(df: DataFrame, id: String, pv: String) =
      df.select(col(idCol).as(id),
        array(projectCols(col(vecCol), model): _*).as(pv))
    def dist2(a: Column, b: Column): Column =
      Similarity.dot(a, a) - lit(2.0) * Similarity.dot(a, b) + Similarity.dot(b, b)
    // shortlist scan carries only (qid, vid, d8) — the heaps and the
    // exchange never see a float vector
    val cand = proj(corpus, "vid", "cp")
      .crossJoin(broadcast(proj(queries, "qid", "qp")))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        graft.functions.Num.rnd(dist2(col("qp"), col("cp")), 6).as("d8"))
    val short = graft.plans.GroupTopK.topKPerKey(cand, Seq("qid"),
      Seq(("d8", false), ("vid", false)), shortlist)
    val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("vid"), col(vecCol).as("cv"))
    val exact = short.join(cv, Seq("vid")).join(broadcast(qv), Seq("qid"))
      .select(col("qid"), col("vid"),
        graft.functions.Num.rnd(dist2(col("qv"), col("cv")), 6).as("dist"))
    PQ.rankTopK(exact, k)
  }
}
