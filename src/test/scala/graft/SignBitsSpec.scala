package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.similarity.Similarity

/** Native SignBitsExpr ≡ the composed 32-DotProduct/when-chain fold —
  * bit-equality on the real corpus AND the corners (null array, null
  * element, wrong dimension, NaN-producing values).
  */
class SignBitsSpec extends SparkSpec {

  private val planes = Similarity.planeLiterals(32, 64, seed = 7L)

  test("native ≡ composed on the embeddings corpus (all seeds used by banded ops)") {
    for (t <- 0 until 4) {
      val ps = Similarity.planeLiterals(32, 64, seed = 7L + t)
      val n = Tables.embeddings(spark, sf)
        .select(Similarity.signBits(col("embedding"), ps).as("a"),
          Similarity.signBitsComposed(col("embedding"), ps).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(n == 0L, s"seed ${7 + t} diverged")
    }
  }

  test("corners: null array, null element, wrong dim, NaN values → same bits") {
    val schema = StructType(Seq(
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val rows = Seq(
      Row(null),
      Row((0 until 64).map(i => if (i == 7) null
        else java.lang.Float.valueOf(i.toFloat)).toArray.toSeq),
      Row(Seq.fill(16)(1.0f)),
      Row(Seq.fill(64)(Float.NaN)),
      Row(Seq.fill(64)(0.0f)),
      Row((0 until 64).map(i => (if (i % 2 == 0) 1.0f else -1.0f)).toSeq))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = df.select(
        Similarity.signBits(col("embedding"), planes).as("a"),
        Similarity.signBitsComposed(col("embedding"), planes).as("b"))
      .collect()
    got.foreach { r => assert(r.getLong(0) == r.getLong(1), r.toString) }
    // null array / null element / wrong-dim hash to 0 (the cell-0
    // contract the SemDeDup kernel relies on); all-NaN hashes to
    // all-ones (Spark AND DuckDB place NaN above every number, so
    // every plane's `dot >= 0` is true)
    assert(got(0).getLong(0) == 0L && got(2).getLong(0) == 0L)
    assert(got(1).getLong(0) == 0L)
    assert(got(3).getLong(0) == 0xFFFFFFFFL)
  }
}
