package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Reusable statistical operators (shared by the q323/q324/q325/q333
  * gate queries and the GFrame API surface).
  *
  * Numeric discipline: moments accumulate as exact decimals (order-
  * independent under any aggregation tree), transcendentals round to
  * 6dp before any float reduction, and sequential recurrences run as
  * bounded ordered folds — never row-at-a-time loops.
  */
object Stats {

  /** 6dp-rounded decimal measurement column (the cross-engine-exact
    * input form for all moment accumulation).
    */
  def vr(c: Column): Column = Num.rnd(c, 6).cast("decimal(18,6)")

  /** Welch's unequal-variance t-test between groups `gA` and `gB` of
    * `groupCol`, over `valueCol`.  One scan, one 2-row aggregate;
    * returns (n1, n2, d_mean, t, dof).
    */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
                 gA: String, gB: String): DataFrame = {
    val ev = df.filter(col(groupCol).isin(gA, gB))
      .select(when(col(groupCol) === gA, lit(1)).otherwise(lit(2)).as("g"),
        vr(col(valueCol)).as("vr"))
    val m = ev.groupBy("g").agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("vr")).cast("double").as("sv"),
      sum(col("vr") * col("vr")).cast("double").as("ss"))
    val p = m.agg(
      max(when(col("g") === 1, col("n"))).as("n1"),
      max(when(col("g") === 1, col("sv"))).as("s1"),
      max(when(col("g") === 1, col("ss"))).as("q1"),
      max(when(col("g") === 2, col("n"))).as("n2"),
      max(when(col("g") === 2, col("sv"))).as("s2"),
      max(when(col("g") === 2, col("ss"))).as("q2"))
    val v1 = (col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1)
    val v2 = (col("q2") - col("s2") * col("s2") / col("n2")) / (col("n2") - 1)
    val se2 = v1 / col("n1") + v2 / col("n2")
    p.select(
      col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
      Num.rnd(col("s1") / col("n1") - col("s2") / col("n2"), 6).as("d_mean"),
      Num.rnd((col("s1") / col("n1") - col("s2") / col("n2")) / sqrt(se2), 6).as("t"),
      Num.rnd(se2 * se2 / ((v1 / col("n1")) * (v1 / col("n1")) / (col("n1") - 1)
        + (v2 / col("n2")) * (v2 / col("n2")) / (col("n2") - 1)), 6).as("dof"))
  }

  /** One-way ANOVA F across all groups of `groupCol` over `valueCol`.
    * The only order-sensitive float reduction (Σ s_g²/n_g) folds in
    * group order (sorted-list fold).  Returns (k, n, ssb, ssw, f).
    */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val ev = df.select(col(groupCol).as("g"), vr(col(valueCol)).as("vr"))
    val m = ev.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(col("vr")).as("sv"),
      sum(col("vr") * col("vr")).as("ss"))
    val folded = m.agg(
      sum(col("n")).as("nn"),
      sum(col("sv")).as("s_all"),
      sum(col("ss")).as("ss_all"),
      count(lit(1)).as("k"),
      sort_array(collect_list(struct(col("g").as("et"),
        (col("sv").cast("double") * col("sv").cast("double")
          / col("n").cast("double")).as("q")))).as("qs"))
    val qsum = aggregate(col("qs"), lit(0.0), (acc, x) => acc + x.getField("q"))
    val base = folded.select(
      col("k"), col("nn"),
      col("nn").cast("double").as("nd"),
      col("s_all").cast("double").as("sd"),
      col("ss_all").cast("double").as("ssd"),
      qsum.as("qsum"))
    val ssb = col("qsum") - col("sd") * col("sd") / col("nd")
    val ssw = col("ssd") - col("qsum")
    base.select(col("k"), col("nn").as("n"),
      Num.rnd(ssb, 6).as("ssb"), Num.rnd(ssw, 6).as("ssw"),
      Num.rnd((ssb / (col("k").cast("double") - 1))
        / (ssw / (col("nd") - col("k").cast("double"))), 6).as("f"))
  }

  /** CUSUM changepoint per group over a prepared (group, day, x)
    * daily-series frame — x must be an exact DECIMAL(18,6).  The
    * deviation dev_i = n·cum_i − i·T stays in integer-scaled decimals
    * (exact argmax, day tiebreak); the cumulative sum is the
    * bounded-domain self-join.  Returns (group, cp_day, dev).
    */
  def cusumChangepoint(daily: DataFrame, groupCol: String,
                       dayCol: String, xCol: String): DataFrame = {
    val base = daily.select(col(groupCol).as("g"), col(dayCol).as("day"),
      col(xCol).as("x"))
    val tot = base.select(col("g").as("tg"), col("x"))
      .groupBy("tg").agg(
        sum(col("x")).cast("decimal(18,6)").as("tt"),
        count(lit(1)).cast("decimal(9,0)").as("nd"))
    val right = base.select(col("g").as("bg"), col("day").as("bday"),
      col("x").as("bx"))
    val cum = base.join(right,
        col("g") === col("bg") && col("bday") <= col("day"))
      .groupBy(col("g"), col("day"))
      .agg(sum(col("bx")).cast("decimal(18,6)").as("cum"),
        count(lit(1)).cast("decimal(9,0)").as("i"))
    val dev = cum.join(tot, col("g") === col("tg"))
      .select(col("g"), col("day"),
        (col("cum") * col("nd") - col("i") * col("tt"))
          .cast("decimal(24,6)").as("dev"))
    val w = Window.partitionBy("g").orderBy(abs(col("dev")).desc, col("day"))
    dev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("g").as(groupCol), col("day").as("cp_day"),
        col("dev").cast("double").as("dev"))
  }

  /** Holt double-exponential smoothing per group over a prepared
    * (group, day, x-double) daily series: ordered bounded array fold.
    * Returns (group, level, trend, forecast).
    */
  def holtSmooth(daily: DataFrame, groupCol: String, dayCol: String,
                 xCol: String, alpha: Double, beta: Double): DataFrame = {
    val ser = daily.groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col(dayCol).as("day"),
        col(xCol).as("x")))).as("s"))
    val init = struct(
      element_at(col("s"), 1).getField("x").as("l"), lit(0.0).as("b"))
    val folded = aggregate(
      slice(col("s"), lit(2), size(col("s")) - 1), init,
      (acc, e) => {
        val x = e.getField("x")
        val nl = lit(alpha) * x + lit(1 - alpha) * (acc.getField("l") + acc.getField("b"))
        struct(nl.as("l"),
          (lit(beta) * (nl - acc.getField("l"))
            + lit(1 - beta) * acc.getField("b")).as("b"))
      })
    ser.select(col(groupCol), folded.as("st"))
      .select(col(groupCol),
        Num.rnd(col("st.l"), 6).as("level"),
        Num.rnd(col("st.b"), 6).as("trend"),
        Num.rnd(col("st.l") + col("st.b"), 6).as("forecast"))
  }
}
