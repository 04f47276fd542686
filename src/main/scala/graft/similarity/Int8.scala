package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-dimension int8 embedding quantization — the 4×
  * memory/bandwidth compression a 100 TB ANN corpus applies before PQ
  * becomes necessary (int8 keeps ~0.99 recall where PQ trades more):
  *
  *   scale_d = max(|x_d|) / 127     (corpus stats pass, 64 rows)
  *   code    = clip(round(x_d / scale_d), -127, 127)
  *
  * Search then runs INTEGER dot products (exact, order-independent —
  * no float-fold contract needed between engines) with an optional
  * exact-cosine rerank of the short list.
  *
  * Cross-engine determinism: elements are 6dp-rounded before stats and
  * codes (the corpus-wide float discipline), the scale divide is one
  * IEEE op, and scale-0 rounding agrees between Spark's BigDecimal and
  * DuckDB's std::round everywhere (see functions.Num). Zero-variance
  * dims quantize to 0 via the 1e-12 scale floor.
  *
  * Scale shape: stats = one posexplode aggregate (64 groups, partial
  * agg); codes = broadcast-join the 64-row stats back + scan-stage
  * rebuild; search = candidate join on the bounded query side.
  */
object Int8 {

  private def rnd6(c: Column): Column = graft.functions.Num.rnd(c, 6)

  /** Per-dimension (pos, amax, scale) stats — 64 rows. */
  def scales(corpus: DataFrame, embCol: String = "embedding"): DataFrame =
    corpus
      .select(posexplode(col(embCol)).as(Seq("pos", "v")))
      .select(col("pos"), rnd6(col("v").cast("double"))
        .cast("decimal(18,6)").as("xr"))
      .groupBy("pos")
      .agg(max(abs(col("xr"))).cast("double").as("amax"))
      .select(col("pos"),
        (greatest(col("amax"), lit(1e-12)) / lit(127.0)).as("scale"))

  /** (idCol, codes array<int>) — lazy two-pass plan (stats broadcast
    * back into the scan; array rebuilt in pos order).
    */
  def quantize(corpus: DataFrame, idCol: String = "vec_id",
               embCol: String = "embedding"): DataFrame = {
    val st = scales(corpus, embCol)
    corpus
      .select(col(idCol), posexplode(col(embCol)).as(Seq("pos", "v")))
      .join(broadcast(st), Seq("pos"))
      .select(col(idCol), col("pos"),
        greatest(lit(-127), least(lit(127),
          round(rnd6(col("v").cast("double")) / col("scale")).cast("int")))
          .as("code"))
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("pos"), col("code")))).as("s"))
      .select(col(idCol), expr("transform(s, x -> x.code)").as("codes"))
  }

  /** Exact integer dot product of two int-code arrays (order-free). */
  def idot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Brute-force int8 top-k: integer-score ranking, ties on corpus id.
    * Queries = the rows of `queries` (bounded; broadcast side).
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
           idCol: String = "vec_id"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col("codes").as("qc"))
    val c = corpus.select(col(idCol).as("vid"), col("codes").as("cc"))
    val scored = c.join(broadcast(q), col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), idot(col("qc"), col("cc")).as("iscore"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("iscore").desc, col("vid").asc)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }
}
