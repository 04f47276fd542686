package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{VecSumAgg, VecSumExpr}

/** Native VecSumExpr ≡ udaf VecSumAgg (the boxed differential twin),
  * plus the null/length-mismatch skip contract.
  */
class VecSumSpec extends SparkSpec {

  private def mk(rows: Seq[(Long, Seq[Float])], parts: Int) = {
    val data = rows.map { case (l, v) =>
      Row(l, if (v == null) null else v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, parts),
      StructType(Seq(
        StructField("label", LongType),
        StructField("embedding", ArrayType(FloatType), nullable = true))))
  }

  test("single partition: native == udaf bit-for-bit (same fold order)") {
    val rows = (0 until 500).map(i =>
      ((i % 3).toLong, Seq.tabulate(8)(j => (math.sin(i * 8 + j) * 10).toFloat)))
    val df = mk(rows, 1)
    val nat = df.groupBy("label").agg(VecSumExpr(8)(col("embedding")).as("s"))
      .select(col("label"), col("s.sums"), col("s.n"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toSeq, r.getLong(2))).sortBy(_._1)
    val twin = df.groupBy("label").agg(VecSumAgg(8)(col("embedding")).as("s"))
      .select(col("label"), col("s._1"), col("s._2"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toSeq, r.getLong(2))).sortBy(_._1)
    assert(nat.toSeq == twin.toSeq)
  }

  test("multi-partition: counts exact, sums equal after 9dp rounding") {
    val rows = (0 until 2000).map(i =>
      ((i % 5).toLong, Seq.tabulate(4)(j => (math.cos(i + j) / 64).toFloat)))
    val df = mk(rows, 7)
    val nat = df.groupBy("label").agg(VecSumExpr(4)(col("embedding")).as("s"))
      .select(col("label"), expr("transform(s.sums, x -> round(x * 1e9) / 1e9)"),
        col("s.n"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toSeq, r.getLong(2))).sortBy(_._1)
    val twin = df.groupBy("label").agg(VecSumAgg(4)(col("embedding")).as("s"))
      .select(col("label"), expr("transform(s._1, x -> round(x * 1e9) / 1e9)"),
        col("s._2"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toSeq, r.getLong(2))).sortBy(_._1)
    assert(nat.toSeq == twin.toSeq)
    assert(nat.map(_._3).sum == 2000L)
  }

  test("null and wrong-length arrays are skipped by both") {
    val rows = Seq[(Long, Seq[Float])](
      (1L, Seq(1f, 2f)), (1L, null), (1L, Seq(3f)), (1L, Seq(4f, 5f)))
    val df = mk(rows, 2)
    for (aggCol <- Seq(VecSumExpr(2)(col("embedding")),
                       VecSumAgg(2)(col("embedding")))) {
      val r = df.groupBy("label").agg(aggCol.as("s")).collect()(0)
      val s = r.getStruct(1)
      assert(s.getSeq[Double](0) == Seq(5.0, 7.0))
      assert(s.getLong(1) == 2L)
    }
  }
}
