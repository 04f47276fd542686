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
  * (vocab-sized; classes are bounded). Class totals / vocab size /
  * priors are 1-row driver stats. Scoring hash-joins the test tokens
  * against the vocab table once and folds per-class terms map-side;
  * the argmax is min(struct(-score, label)) — no window, no driver
  * funnel.
  *
  * The model is PERSISTABLE ([[fitModel]] → one long-format parquet
  * table) and mergeable by unioned count-sum, joining the persisted-
  * model family (gram index q431/q432, MG sketch q389, LSH buckets
  * q194): classify-new-batches workloads fit once and pay only the
  * scoring join per call (q440).
  */
object NaiveBayes {

  /** Persistable model: long-format rows
    *  - ("tok", tok, label, c): token count per class;
    *  - ("doc", null, label, c): training document count per class.
    * Everything [[predictFromModel]] needs derives from this one table.
    */
  def fitModel(train: DataFrame, textCol: String, labelCol: String): DataFrame = {
    val toks = train
      .select(col(labelCol).as("label"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    toks.groupBy("tok", "label").agg(count(lit(1)).as("c"))
      .select(lit("tok").as("kind"), col("tok"), col("label"), col("c"))
      .unionByName(
        train.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("c"))
          .select(lit("doc").as("kind"), lit(null: String).as("tok"),
            col("label"), col("c")))
  }

  /** Per-doc argmax prediction from a (possibly persisted) model:
    * (idCol, pred_label).
    */
  def predictFromModel(model: DataFrame, test: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    val tokCounts = model.filter(col("kind") === "tok")
    val nDocsByClass = model.filter(col("kind") === "doc")
      .select("label", "c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val classes = nDocsByClass.keys.toSeq.sorted
    val nTrainDocs = nDocsByClass.values.sum
    val nTokByClass = tokCounts.groupBy("label").agg(sum("c").as("nc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocabSize = tokCounts.select("tok").distinct().count()
    val wc = tokCounts.groupBy("tok").agg(
      sum(when(col("label") === classes.head, col("c"))).as("c_0"),
      classes.tail.zipWithIndex.map { case (cl, i) =>
        sum(when(col("label") === cl, col("c"))).as(s"c_${i + 1}") }: _*)
    val qt = test
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(idCol, "tok").agg(count(lit(1)).as("o"))
    val joined = qt.join(wc, Seq("tok"), "left")
    val sums = classes.zipWithIndex.map { case (cl, i) =>
      val denom = (nTokByClass.getOrElse(cl, 0L) + vocabSize).toDouble
      sum(col("o").cast("decimal(18,0)") *
        Num.rnd(log((coalesce(col(s"c_$i"), lit(0L)) + lit(1L))
          .cast("double") / lit(denom)), 6).cast("decimal(18,6)"))
        .as(s"s_$i") }
    val perDoc = joined.groupBy(idCol).agg(sums.head, sums.tail: _*)
    val scoreMap = classes.zipWithIndex.flatMap { case (cl, i) =>
      val prior = Num.rnd(
        log(lit(nDocsByClass(cl).toDouble / nTrainDocs)), 6)
        .cast("decimal(18,6)")
      Seq(lit(cl), (col(s"s_$i") + prior).cast("decimal(38,6)")) }
    perDoc
      .select(col(idCol),
        explode(map(scoreMap: _*)).as(Seq("__label", "__score")))
      .groupBy(idCol)
      .agg(min(struct((-col("__score")).as("ns"),
        col("__label").as("l"))).as("m"))
      .select(col(idCol), col("m.l").as("pred_label"))
  }

  /** Frozen scoring model for scan-stage / STREAMING classification:
    * every ln term pre-rounded to the 6dp grid and scaled to an exact
    * long (decimal(·,6) arithmetic on the grid ≡ long arithmetic on
    * scaled values, so the kernel's argmax is bit-identical to the
    * DataFrame path's DECIMAL sums). Driver/executor memory ∝ vocab —
    * the deployment trade of every frozen-classifier broadcast (q261);
    * the join path ([[predictFromModel]]) remains the huge-vocab route.
    */
  case class Frozen(classes: Array[String], priors6: Array[Long],
                    missing6: Array[Long], liks6: Map[String, Array[Long]])

  /** Freeze a [[fitModel]] table. The scaled terms are computed by
    * SPARK expressions (same `Num.rnd(log(...))` the DataFrame path
    * uses), not driver-side math — so the grid values cannot drift.
    */
  def freeze(model: DataFrame): Frozen = {
    val tokCounts = model.filter(col("kind") === "tok")
    val nDocsByClass = model.filter(col("kind") === "doc")
      .select("label", "c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val classes = nDocsByClass.keys.toArray.sorted
    val nTrainDocs = nDocsByClass.values.sum
    val nTokByClass = tokCounts.groupBy("label").agg(sum("c").as("nc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocabSize = tokCounts.select("tok").distinct().count()
    val denoms = classes.map(cl => (nTokByClass.getOrElse(cl, 0L) + vocabSize).toDouble)
    def lik6(cnt: org.apache.spark.sql.Column, denom: Double) =
      (Num.rnd(log((cnt + lit(1L)).cast("double") / lit(denom)), 6) * 1e6)
        .cast("long")
    val wide = tokCounts.groupBy("tok").agg(
      sum(when(col("label") === classes.head, col("c"))).as("c_0"),
      classes.tail.zipWithIndex.map { case (cl, i) =>
        sum(when(col("label") === cl, col("c"))).as(s"c_${i + 1}") }: _*)
    val liksDf = wide.select(col("tok") +:
      classes.indices.map(i =>
        lik6(coalesce(col(s"c_$i"), lit(0L)), denoms(i)).as(s"l_$i")): _*)
    val liks = liksDf.collect().map { r =>
      r.getString(0) -> classes.indices.map(i => r.getLong(i + 1)).toArray
    }.toMap
    val spark = model.sparkSession
    import spark.implicits._
    val consts = Seq(1).toDF("one").select(
      classes.zipWithIndex.flatMap { case (cl, i) => Seq(
        (Num.rnd(log(lit(nDocsByClass(cl).toDouble / nTrainDocs)), 6) * 1e6)
          .cast("long").as(s"p_$i"),
        lik6(lit(0L), denoms(i)).as(s"m_$i")) }: _*).collect()(0)
    Frozen(classes,
      classes.indices.map(i => consts.getLong(2 * i)).toArray,
      classes.indices.map(i => consts.getLong(2 * i + 1)).toArray,
      liks)
  }

  /** Score one space-delimited text against a [[Frozen]] model —
    * argmax class (score desc, class asc on ties), exact long
    * arithmetic on the 6dp grid.
    */
  def classify(m: Frozen, text: String): String = {
    val scores = m.priors6.clone()
    var i = 0
    val toks = text.split(' ')
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        val lik = m.liks6.getOrElse(t, m.missing6)
        var c = 0
        while (c < scores.length) { scores(c) += lik(c); c += 1 }
      }
      i += 1
    }
    var best = 0
    var c = 1
    while (c < scores.length) {
      if (scores(c) > scores(best)) best = c
      c += 1
    }
    m.classes(best)
  }

  /** Fit + predict in one call (q437's eager path). */
  def predict(train: DataFrame, test: DataFrame, textCol: String,
              labelCol: String, idCol: String): DataFrame =
    predictFromModel(fitModel(train, textCol, labelCol), test, textCol, idCol)

  /** Confusion matrix over the held-out split:
    * (true_label, pred_label, n_docs).
    */
  def confusion(train: DataFrame, test: DataFrame, textCol: String,
                labelCol: String, idCol: String): DataFrame =
    confusionFromModel(fitModel(train, textCol, labelCol), test,
      textCol, labelCol, idCol)

  /** [[confusion]] from a (possibly persisted) model. */
  def confusionFromModel(model: DataFrame, test: DataFrame, textCol: String,
                         labelCol: String, idCol: String): DataFrame =
    predictFromModel(model, test, textCol, idCol)
      .join(test.select(col(idCol), col(labelCol).as("true_label")), idCol)
      .groupBy("true_label", "pred_label")
      .agg(count(lit(1)).as("n_docs"))
}
