package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split each d-dim vector into
  * `m` contiguous subvectors of `dsub = d/m` dims, quantize each
  * subvector independently against a per-subspace codebook of `ksub`
  * centroids, and represent the vector by its `m` code bytes.
  *
  * Combined with the IVF coarse quantizer ([[IVF]]/[[IVFCentroids]])
  * this is the standard billion-scale ANN layout (FAISS IVFPQ): the
  * corpus is stored as (cell, codes) — a few bytes per vector instead
  * of d floats — partitioned by cell on disk; a query probes `nprobe`
  * cells and scores candidates with ADC (asymmetric distance): one
  * m×ksub lookup table of exact query-to-centroid subdistances,
  * then distance(q, v) ≈ Σ_s LUT[s][code_s(v)], an O(m) table walk per
  * candidate with no float vector ever read at query time.
  *
  * At 100 TB this is the difference between scanning 256 GB of codes
  * and 26 TB of raw floats for the same corpus. Everything here is
  * scan-stage Catalyst expressions over the frozen codebook literals
  * (no UDF, no join against a codebook table), so the DuckDB oracle
  * can replay the identical double-precision arithmetic.
  *
  * The reference has no ANN surface (beyond-parity pipeline tooling;
  * its nearest analogue is the categorical dictionary encode at
  * `legate/pandas/core/column.py`-level, which is not a metric code).
  */
object PQ {

  /** codebooks(s)(j) = centroid j of subspace s (dsub doubles). */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    val m: Int = codebooks.length
    val ksub: Int = codebooks(0).length
    val dsub: Int = codebooks(0)(0).length

    /** Subvector s of an array<float|double> column (1-based slice). */
    def subvec(vec: Column, s: Int): Column = slice(vec, s * dsub + 1, dsub)

    /** Exact squared L2 from a subvector to centroid (s, j):
      * |u|² − 2·u·c + |c|² with the sequential-fold dot product —
      * the same expression shape as IVF.Model.dist2 so the oracle
      * reproduces it bit-for-bit.
      */
    private def dist2(sub: Column, c: Array[Double]): Column = {
      val cn2 = c.map(x => x * x).sum
      Similarity.dot(sub, sub) -
        lit(2.0) * Similarity.dot(sub, typedlit(c.toSeq)) + lit(cn2)
    }

    /** Code of subspace s: argmin_j dist2 (ties → smallest j). */
    def code(vec: Column, s: Int): Column = {
      val sub = subvec(vec, s)
      val pairs = array((0 until ksub).map(j =>
        struct(dist2(sub, codebooks(s)(j)).as("d"), lit(j).as("j"))): _*)
      array_min(pairs).getField("j")
    }

    /** Full m-code encoding as array<int> — the native one-pass kernel
      * ([[PqEncode]]; bit-identical to [[encodeComposed]], which the
      * differential spec pins).
      */
    def encode(vec: Column): Column = {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebooks))
    }

    /** Composed-expression twin of [[encode]] (spec differential only —
      * m·ksub struct/dot nodes per row, JIT-hostile at any scale).
      */
    def encodeComposed(vec: Column): Column =
      array((0 until m).map(code(vec, _)): _*)

    /** Decode: the reconstructed vector (concatenated centroids). */
    def decode(codes: Column): Column =
      concat((0 until m).map { s =>
        element_at(
          typedlit(codebooks(s).map(_.toSeq).toSeq),
          element_at(codes, s + 1) + lit(1))
      }: _*)

    /** ADC lookup table for a QUERY vector: lut[s][j] = exact squared
      * L2 from query-subvector s to centroid (s, j). m×ksub doubles,
      * computed once per query row. Native [[PqLut]] (r13): the
      * composed twin below carried the full codebook as literals in
      * the plan (44 KB on q239; per-pass planning dominated).
      */
    def lut(vec: Column): Column = {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(PqLut(ColumnBridge.expression(vec), codebooks))
    }

    /** Composed twin of [[lut]] (spec differential only). */
    def lutComposed(vec: Column): Column =
      array((0 until m).map { s =>
        val sub = subvec(vec, s)
        array((0 until ksub).map(j => dist2(sub, codebooks(s)(j))): _*)
      }: _*)

    /** ADC distance: Σ_s lut[s][codes[s]], summed left-to-right in a
      * fixed association order (term 0 + term 1 + …) so any engine
      * replaying the same order gets the identical double.
      */
    def adcDist(lutCol: Column, codes: Column): Column =
      (0 until m).map { s =>
        element_at(element_at(lutCol, s + 1), element_at(codes, s + 1) + lit(1))
      }.reduce(_ + _)
  }

  /** Train per-subspace KMeans codebooks (seeded → deterministic).
    * Driver-side, on a sample — the production pattern is offline fit
    * then frozen literals ([[PQCodebooks]]), exactly like
    * [[IVFCentroids]].
    */
  def fit(corpus: DataFrame, m: Int, ksub: Int, seed: Long = 42L): Model = {
    val dims = corpus.select(size(col("embedding"))).head.getInt(0)
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val dsub = dims / m
    val books = (0 until m).map { s =>
      val sub = corpus.select(
        array_to_vector(slice(col("embedding"), s * dsub + 1, dsub).cast("array<double>"))
          .as("features"))
      val km = new KMeans().setK(ksub).setSeed(seed + s).setMaxIter(10)
        .setFeaturesCol("features")
      km.fit(sub).clusterCenters.map(_.toArray)
    }
    Model(books.toArray)
  }

  /** IVF-PQ ANN top-k: probe the `nprobe` IVF cells nearest each query,
    * score candidates by ADC over their PQ codes, keep the k smallest
    * distances (rounded to 6 dp before ranking; ties break on corpus
    * id). The corpus side carries only (id, cell, codes) — at scale it
    * is the cell-partitioned code table, never the raw vectors.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
                coarse: IVF.Model, pq: Model, k: Int, nprobe: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val codes = corpus.select(
      col(idCol).as("vid"),
      coarse.cell(col(vecCol)).as("cell"),
      pq.encode(col(vecCol)).as("codes"))
    // explode probes → hash equi-join on cell (a corpus vector has one
    // cell and the probe list is distinct, so each (q, v) pair joins at
    // most once; no nested-loop array_contains scan).
    val q = queries.select(
      col(idCol).as("qid"),
      explode(coarse.probeCells(col(vecCol), nprobe)).as("cell"),
      pq.lut(col(vecCol)).as("lut"))
    val cand = codes.join(broadcast(q), Seq("cell"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        graft.functions.Num.rnd(pq.adcDist(col("lut"), col("codes")), 6).as("dist"))
    rankTopK(cand, k)
  }

  /** Bounded-heap top-k + rank: GroupTopK keeps k rows per query below
    * the exchange (partial heaps map-side — the candidate stream never
    * sorts or shuffles whole), then the rn window touches only |Q|·k
    * rows.
    */
  private[similarity] def rankTopK(cand: DataFrame, k: Int): DataFrame = {
    val top = graft.plans.GroupTopK.topKPerKey(cand, Seq("qid"),
      Seq(("dist", false), ("vid", false)), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("dist").asc, col("vid").asc)
    top.withColumn("rn", row_number().over(w).cast("long"))
  }

  /** IVF-PQ with EXACT RERANK (the production refinement step): ADC
    * shortlists `shortlist` candidates per query, then only those rows
    * re-fetch their float vectors (hash join on id — at scale a point
    * lookup into the vector store, k·|Q| rows, never a corpus scan)
    * and re-rank by exact squared L2. Recovers most of the recall the
    * code distortion loses while still scanning only codes.
    */
  def ivfPqRerankTopK(queries: DataFrame, corpus: DataFrame,
                      coarse: IVF.Model, pq: Model, k: Int, nprobe: Int,
                      shortlist: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val short = ivfPqTopK(queries, corpus, coarse, pq, shortlist, nprobe, idCol, vecCol)
      .select(col("qid"), col("vid"))
    val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("vid"), col(vecCol).as("cv"))
    val exact = short.join(cv, Seq("vid")).join(broadcast(qv), Seq("qid"))
      .select(col("qid"), col("vid"),
        graft.functions.Num.rnd(
          Similarity.dot(col("cv"), col("cv")) -
            lit(2.0) * Similarity.dot(col("qv"), col("cv")) +
            Similarity.dot(col("qv"), col("qv")), 6).as("dist"))
    rankTopK(exact, k)
  }

  /** Persist the IVFPQ layout: (vid, codes) parquet PARTITIONED BY the
    * coarse cell — the on-disk billion-scale index (FAISS IVFPQ's
    * inverted lists as cell directories). Encoding is one codegen'd
    * scan; the write shuffles on cell so each cell directory is a few
    * contiguous files.
    */
  def writeCodeIndex(corpus: DataFrame, coarse: IVF.Model, pq: Model, path: String,
                     idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    corpus.select(
        col(idCol).as("vid"),
        coarse.cell(col(vecCol)).as("cell"),
        pq.encode(col(vecCol)).as("codes"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** ANN over a persisted [[writeCodeIndex]] index: the probed cells are
    * collected driver-side (|Q|·nprobe ints — a point list, same scale
    * contract as a partition predicate) and pushed as a PARTITION
    * FILTER, so the scan reads only the probed cell directories —
    * nprobe/k of the index, however large the corpus. Everything after
    * the pruned scan is the [[ivfPqTopK]] plan.
    */
  def searchCodeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, coarse: IVF.Model, pq: Model,
                      k: Int, nprobe: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(
      col(idCol).as("qid"),
      explode(coarse.probeCells(col(vecCol), nprobe)).as("cell"),
      pq.lut(col(vecCol)).as("lut"))
    val probed = q.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    val codes = spark.read.parquet(path)
      .filter(col("cell").isin(probed.map(Integer.valueOf): _*))
    val cand = codes.join(broadcast(q), Seq("cell"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        graft.functions.Num.rnd(pq.adcDist(col("lut"), col("codes")), 6).as("dist"))
    rankTopK(cand, k)
  }
}
