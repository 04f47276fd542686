package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * corpus into k Voronoi cells with KMeans, search only the `nprobe`
  * cells nearest to each query.
  *
  * This is the second scale path next to hyperplane LSH
  * ([[Similarity.lshTopK]]): at 10^9+ vectors the corpus is
  * cluster-partitioned on disk (partitionBy(cell) parquet), a query
  * touches nprobe/k of the data, and the shuffle carries only candidate
  * cells. KMeans training runs on a sample; seeded → deterministic.
  *
  * Centroids are tiny (k × dims doubles) and ride to executors as
  * expression literals — no join against a centroid table.
  */
object IVF {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length

    private lazy val cNorm2 = centroids.map(_.map(x => x * x).sum)

    private def nearest(vec: Column, nprobe: Int): Column = {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(NearestCells(
        ColumnBridge.expression(vec), centroids, cNorm2, nprobe))
    }

    /** Nearest cell id (argmin over centroid distances) — native
      * [[NearestCells]] (r13): the composed array_min-over-literals
      * spelling below put k×dims centroid constants in the Catalyst
      * tree (q239's plan was 76 KB; per-pass planning cost more than
      * its task time). Bit-identity pinned in IVFSpec ("native NearestCells ≡ composed").
      */
    def cell(vec: Column): Column = nearest(vec, 1)

    /** The `nprobe` nearest cell ids as an array column. */
    def probeCells(vec: Column, nprobe: Int): Column = nearest(vec, nprobe)

    /** squared L2 distance to centroid j as a pure expression —
      * composed differential twin of [[NearestCells]] (spec only).
      */
    private def dist2(vec: Column, j: Int): Column = {
      val c = centroids(j)
      val dot = Similarity.dot(vec, typedlit(c.toSeq))
      val cNorm2 = c.map(x => x * x).sum
      Similarity.dot(vec, vec) - lit(2.0) * dot + lit(cNorm2)
    }

    /** Composed twin of [[cell]] (spec differential only). */
    def cellComposed(vec: Column): Column = {
      val pairs = array((0 until k).map(j =>
        struct(dist2(vec, j).as("d"), lit(j).as("j"))): _*)
      array_min(pairs).getField("j")
    }

    /** Composed twin of [[probeCells]] (spec differential only). */
    def probeCellsComposed(vec: Column, nprobe: Int): Column = {
      val pairs = array((0 until k).map(j =>
        struct(dist2(vec, j).as("d"), lit(j).as("j"))): _*)
      transform(slice(array_sort(pairs), 1, nprobe), s => s.getField("j"))
    }
  }

  /** Train on the corpus `embedding` column (array<float>). */
  def fit(corpus: DataFrame, k: Int, seed: Long = 42L): Model = {
    val feats = corpus.select(array_to_vector(col("embedding")).as("features"))
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(10).setFeaturesCol("features")
    val model = km.fit(feats)
    Model(model.clusterCenters.map(_.toArray))
  }

  /** ANN top-k: search only the nprobe cells nearest each query. */
  def topK(queries: DataFrame, corpus: DataFrame, model: Model,
           k: Int, nprobe: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("vid"), col("embedding").as("cv"),
      model.cell(col("embedding")).as("cell"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
        explode(model.probeCells(col("embedding"), nprobe)).as("cell"))
    val sims = c.join(broadcast(q), Seq("cell"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("sim", graft.functions.Num.rnd(Similarity.cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid").asc)
    sims.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vid"), col("sim"), col("rn").cast("long").as("rn"))
  }
}
