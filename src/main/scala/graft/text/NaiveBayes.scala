package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Multinomial Naive Bayes over space-delimited tokens — the TRAINABLE
  * half of model-based quality/language filtering (the frozen-weights
  * deployment half is `text/QualityModel`, q261). Laplace-smoothed
  * per-class token likelihoods; every transcendental term follows the
  * q153 discipline (6dp-rounded ln, DECIMAL-summed) so scores — and the
  * argmax — are bit-identical cross-engine.
  *
  * Scale shape: the per-(word, class) count table stays DISTRIBUTED
  * (vocab-sized, one wide hash-agg; classes are bounded so each row is
  * |classes| longs); class totals / vocab size / priors are 1-row
  * driver stats. Scoring hash-joins the test tokens against the vocab
  * table once and folds per-class terms map-side; the argmax is
  * min(struct(-score, label)) — no window, no driver funnel.
  */
object NaiveBayes {

  /** Per-doc argmax prediction: (idCol, pred_label). */
  def predict(train: DataFrame, test: DataFrame, textCol: String,
              labelCol: String, idCol: String): DataFrame = {
    def toks(df: DataFrame, keep: Seq[String]) = df
      .select(keep.map(col) :+ explode(split(col(textCol), " ")).as("tok"): _*)
      .filter(col("tok") =!= "")
    val trainToks = toks(train, Seq(labelCol))
    val classes = train.select(labelCol).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val nTokByClass = trainToks.groupBy(labelCol).agg(count(lit(1)).as("nc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocabSize = trainToks.select("tok").distinct().count()
    val nTrainDocs = train.count()
    val nDocsByClass = train.groupBy(labelCol).agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wc = trainToks.groupBy("tok").agg(
      sum(when(col(labelCol) === classes.head, 1L).otherwise(0L)).as("c_0"),
      classes.tail.zipWithIndex.map { case (c, i) =>
        sum(when(col(labelCol) === c, 1L).otherwise(0L)).as(s"c_${i + 1}") }: _*)
    val qt = toks(test, Seq(idCol))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("o"))
    val joined = qt.join(wc, Seq("tok"), "left")
    val sums = classes.zipWithIndex.map { case (c, i) =>
      val denom = (nTokByClass.getOrElse(c, 0L) + vocabSize).toDouble
      sum(col("o").cast("decimal(18,0)") *
        Num.rnd(log((coalesce(col(s"c_$i"), lit(0L)) + lit(1L))
          .cast("double") / lit(denom)), 6).cast("decimal(18,6)"))
        .as(s"s_$i") }
    val perDoc = joined.groupBy(idCol).agg(sums.head, sums.tail: _*)
    val scoreMap = classes.zipWithIndex.flatMap { case (c, i) =>
      val prior = Num.rnd(
        log(lit(nDocsByClass(c).toDouble / nTrainDocs)), 6)
        .cast("decimal(18,6)")
      Seq(lit(c), (col(s"s_$i") + prior).cast("decimal(38,6)")) }
    perDoc
      .select(col(idCol),
        explode(map(scoreMap: _*)).as(Seq("__label", "__score")))
      .groupBy(idCol)
      .agg(min(struct((-col("__score")).as("ns"),
        col("__label").as("l"))).as("m"))
      .select(col(idCol), col("m.l").as("pred_label"))
  }

  /** Confusion matrix over the held-out split:
    * (true_label, pred_label, n_docs).
    */
  def confusion(train: DataFrame, test: DataFrame, textCol: String,
                labelCol: String, idCol: String): DataFrame =
    predict(train, test, textCol, labelCol, idCol)
      .join(test.select(col(idCol), col(labelCol).as("true_label")), idCol)
      .groupBy("true_label", "pred_label")
      .agg(count(lit(1)).as("n_docs"))
}
