package graft

import org.apache.spark.sql.functions._

import graft.functions.{MisraGries, MisraGriesExpr}

/** Native MisraGriesExpr ≡ the boxed udaf twin, plus the MG frequency
  * guarantee on a known skew.
  */
class MisraGriesExprSpec extends SparkSpec {
  import spark.implicits._

  test("single partition: native candidate set == udaf twin exactly") {
    // deterministic skewed stream: token i appears ~1000/i times
    val items = (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"tok$i"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(items.map(Tuple1(_)), 1).map(t =>
        org.apache.spark.sql.Row(t._1)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType))))
    for (k <- Seq(4, 16, 64)) {
      val nat = df.agg(MisraGriesExpr(k)(col("item"))).collect()(0)
        .getSeq[String](0).toSeq
      val twin = df.agg(MisraGries.mgUdaf(k)(col("item"))).collect()(0)
        .getSeq[String](0).toSeq
      assert(nat == twin, s"k=$k")
    }
  }

  test("multi-partition: the MG guarantee holds (heavy items survive)") {
    // 7 partitions, arbitrary merge order: every item with frequency
    // > N/(k+1) MUST be in the candidate set
    val items = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"t$i"))
    val n = items.size
    val df = items.toDF("item").repartition(7)
    val k = 16
    val cand = df.agg(MisraGriesExpr(k)(col("item"))).collect()(0)
      .getSeq[String](0).toSet
    val freq = items.groupBy(identity).view.mapValues(_.size)
    val heavy = freq.filter(_._2 > n.toDouble / (k + 1)).keys.toSet
    assert(heavy.subsetOf(cand),
      s"missing heavy hitters: ${heavy.diff(cand)}")
    assert(cand.size <= k)
  }

  test("nulls are skipped; empty input yields empty candidates") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("item")
    val cand = df.agg(MisraGriesExpr(4)(col("item"))).collect()(0)
      .getSeq[String](0).toSeq
    assert(cand == Seq("a", "b"))
    val empty = df.filter(col("item") === "zzz")
      .agg(MisraGriesExpr(4)(col("item"))).collect()(0).getSeq[String](0)
    assert(empty.isEmpty)
  }
}
