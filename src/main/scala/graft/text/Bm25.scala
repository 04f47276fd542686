package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

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
  * scan-stage expression over ONE [[TermCountsExpr]] pass (a single
  * tokenization however many query terms — the composed
  * size(filter(split…)) per term is CodegenFallback and re-splits per
  * use), and the final top-k is a TakeOrdered. At 100 TB: one stats
  * pass + one scoring pass, no pair blow-up anywhere.
  *
  * The reference has no retrieval surface (beyond-parity tooling).
  */
object Bm25 {

  /** [tf(term_0) … tf(term_{k-1}), dl] in one codegen'd pass. */
  def termCounts(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TermCountsExpr(ColumnBridge.expression(text), terms))

  /** Composed twin of [[termCounts]] (interpreted; differential tests). */
  def termCountsComposed(text: Column, terms: Seq[String]): Column = {
    val toks = split(text, " ")
    array((terms.map(t =>
      size(filter(toks, x => x === lit(t))).cast("double")) :+
      size(toks).cast("double")): _*)
  }

  /** tf of `terms(i)` from a [[termCounts]] array. */
  def tf(tc: Column, i: Int): Column = element_at(tc, i + 1)

  /** dl from a [[termCounts]] array (last slot). */
  def dl(tc: Column, nTerms: Int): Column = element_at(tc, nTerms + 1)

  /** Per-term document frequency + N + avgdl, as one 1-row DataFrame
    * (columns: n_docs, avgdl, df_0 … df_{k-1} in `terms` order).
    */
  def corpusStats(docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    val tc = termCounts(col(textCol), terms)
    val aggs =
      count(lit(1)).cast("double").as("n_docs") +:
      avg(dl(tc, terms.size)).as("avgdl") +:
      terms.indices.map { i =>
        sum(when(tf(tc, i) > 0, 1.0).otherwise(0.0)).as(s"df_$i")
      }
    docs.agg(aggs.head, aggs.tail: _*)
  }

  /** BM25 score column given the (broadcast) stats columns in scope and
    * a [[termCounts]] array column. The per-term contributions sum
    * left-to-right in `terms` order — a fixed association order the
    * oracle replays exactly.
    */
  def score(tc: Column, nTerms: Int, k1: Double = 1.2, b: Double = 0.75): Column = {
    val len = dl(tc, nTerms)
    (0 until nTerms).map { i =>
      val f = tf(tc, i)
      val idf = log(lit(1.0) + (col("n_docs") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5)))
      idf * (f * lit(k1 + 1.0)) /
        (f + lit(k1) * (lit(1.0 - b) + lit(b) * len / col("avgdl")))
    }.reduce(_ + _)
  }

  /** Top-k documents for the query terms: stats pass → broadcast 1-row
    * join → scan-stage score → TakeOrdered. Rounded to 6 dp before
    * ranking; ties break on doc id.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // tokenize ONCE: the (id, counts) projection is ~40 bytes/doc —
    // caching it means the raw text is scanned a single time and both
    // the stats pass and the scoring pass read the tiny counts table
    // (at 100 TB: materialize the projection, not the corpus).
    val tcTab = docs
      .select(col(idCol), termCounts(col(textCol), terms).as("__tc"))
      .cache()
    val tc = col("__tc")
    val aggs =
      count(lit(1)).cast("double").as("n_docs") +:
      avg(dl(tc, terms.size)).as("avgdl") +:
      terms.indices.map(i => sum(when(tf(tc, i) > 0, 1.0).otherwise(0.0)).as(s"df_$i"))
    val stats = tcTab.agg(aggs.head, aggs.tail: _*)
    val scored = tcTab.crossJoin(broadcast(stats))
      .select(col(idCol),
        graft.functions.Num.rnd(score(col("__tc"), terms.size, k1, b), 6).as("bm25"))
      .filter(col("bm25") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col(idCol).asc)
    // global top-k: orderBy+limit compiles to TakeOrderedAndProject
    scored.orderBy(col("bm25").desc, col(idCol).asc).limit(k)
      .withColumn("rn", row_number().over(w).cast("long"))
  }
}
