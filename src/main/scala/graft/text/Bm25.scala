package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword ranking (Robertson/Spärck Jones; the Lucene-default
  * scoring function) over a document corpus — the retrieval side of a
  * training-data pipeline (e.g. targeted corpus slicing, eval-set
  * neighborhood mining, quality-by-query probes).
  *
  * score(D, Q) = Σ_{t ∈ Q} idf(t) · tf(t,D)·(k1+1) /
  *                          (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
  * with the Lucene idf: ln(1 + (N − df + 0.5)/(df + 0.5)).
  *
  * Scale shape: corpus statistics (N, avgdl, df per query term) are a
  * handful of doubles — one aggregate over the corpus, broadcast back
  * as a 1-row cross join; the per-document score is then a pure
  * scan-stage expression (tf via a codegen'd array filter, no explode,
  * no shuffle), and the final top-k is a TakeOrdered. At 100 TB:
  * one stats pass + one scoring pass, no pair blow-up anywhere.
  *
  * The reference has no retrieval surface (beyond-parity tooling).
  */
object Bm25 {

  /** tf: occurrences of `term` among the whitespace tokens. */
  def tf(text: Column, term: String): Column =
    size(filter(TextStats.tokens(text), t => t === lit(term))).cast("double")

  /** Per-term document frequency + N + avgdl, as one 1-row DataFrame
    * (columns: n_docs, avgdl, df_0 … df_{k-1} in `terms` order).
    */
  def corpusStats(docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    val aggs =
      count(lit(1)).cast("double").as("n_docs") +:
      avg(TextStats.nTokens(col(textCol)).cast("double")).as("avgdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(tf(col(textCol), t) > 0, 1.0).otherwise(0.0)).as(s"df_$i")
      }
    docs.agg(aggs.head, aggs.tail: _*)
  }

  /** BM25 score column given the (broadcast) stats columns in scope.
    * The per-term contributions sum left-to-right in `terms` order —
    * a fixed association order the oracle replays exactly.
    */
  def score(text: Column, terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): Column = {
    val dl = TextStats.nTokens(text).cast("double")
    terms.zipWithIndex.map { case (t, i) =>
      val f = tf(text, t)
      val idf = log(lit(1.0) + (col("n_docs") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5)))
      idf * (f * lit(k1 + 1.0)) /
        (f + lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("avgdl")))
    }.reduce(_ + _)
  }

  /** Top-k documents for the query terms: stats pass → broadcast 1-row
    * join → scan-stage score → TakeOrdered. Rounded to 6 dp before
    * ranking; ties break on doc id.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = corpusStats(docs, textCol, terms)
    val scored = docs.crossJoin(broadcast(stats))
      .select(col(idCol),
        graft.functions.Num.rnd(score(col(textCol), terms, k1, b), 6).as("bm25"))
      .filter(col("bm25") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col(idCol).asc)
    // global top-k: orderBy+limit compiles to TakeOrderedAndProject
    scored.orderBy(col("bm25").desc, col(idCol).asc).limit(k)
      .withColumn("rn", row_number().over(w).cast("long"))
  }
}
