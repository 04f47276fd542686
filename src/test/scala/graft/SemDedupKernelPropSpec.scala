package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.similarity.Similarity

/** Differential property test for the r11 SemDeDup election kernel:
  * an INDEPENDENT driver-side replay (same hashing, same sequential
  * float→double arithmetic, same shortest-decimal rounding as Num.rnd)
  * over randomized corpora that include null embeddings, wrong-length
  * vectors, and a tiny maxCell cap — corners the oracle-backed gates
  * never exercise (the test corpus has none of them).
  */
class SemDedupKernelPropSpec extends SparkSpec {

  private def rnd6(x: Double): Double =
    java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Driver-side reference election — the ORIGINAL pair-join semantics:
    * dominated iff some lower-id participant in the same cell has
    * rnd(cos, 6) >= threshold; rows past the id-rank cap neither
    * dominate nor get dominated; null / length-mismatched pairs can't
    * dominate.
    */
  private def refKept(rows: Seq[(Long, Array[Float])], c: Long,
      threshold: Double, maxCell: Int): Map[Long, Boolean] = {
    val planes = Similarity.planeLiterals(32, 64, seed = 7L)
    def cell(v: Array[Float]): Long = {
      var sig = 0L
      var p = 0
      while (p < 32) {
        var acc = 0.0; var d = 0
        while (d < v.length) { acc += v(d).toDouble * planes(p)(d); d += 1 }
        if (acc >= 0) sig |= (1L << p)
        p += 1
      }
      ((sig % c) + c) % c
    }
    // null and wrong-dim vectors hash to cell 0: DotProduct returns
    // null on length mismatch (and on a null side), every sign bit
    // falls to its otherwise(0) branch, and pmod(0, c) = 0 — they
    // OCCUPY participant ranks there (matters under the cap)
    rows.groupBy { case (_, v) =>
      if (v == null || v.length != 64) 0L else cell(v) }
      .flatMap { case (_, members) =>
        val sorted = members.sortBy(_._1)
        sorted.zipWithIndex.map { case ((id, v), j) =>
          val dominated = v != null && j < maxCell &&
            sorted.take(j).exists { case (_, u) =>
              u != null && u.length == v.length && {
                val sim = dot(u, v) / (math.sqrt(dot(u, u)) * math.sqrt(dot(v, v)))
                // NaN (zero-norm side) dominates: Spark/DuckDB order
                // NaN above every number, so rnd(NaN) >= t is true
                sim.isNaN || rnd6(sim) >= threshold
              }
            }
          id -> !dominated
        }
      }
  }

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  test("semDedupScaled ≡ driver replay on random corpora with nulls, bad lengths, tiny cap") {
    val rng = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val n = 120 + trial * 40
      // clustered directions so real dominations occur at t = 0.4
      val centers = Array.fill(5)(Array.fill(64)(rng.nextGaussian().toFloat))
      val rows: Seq[(Long, Array[Float])] = (0L until n.toLong).map { id =>
        val v: Array[Float] =
          if (id % 31 == 7) null
          else if (id % 29 == 11) Array.fill(16)(rng.nextFloat()) // wrong dim
          else if (id % 37 == 13) Array.fill(64)(0.0f) // zero norm → NaN sims
          else {
            val ctr = centers((id % 5).toInt)
            Array.tabulate(64)(d => ctr(d) + 0.05f * rng.nextGaussian().toFloat)
          }
        id -> v
      }
      val targetCell = 32
      val maxCell = if (trial == 3) 7 else 1000 // trial 3 stresses the cap
      val c = math.max(1L, (n + targetCell - 1) / targetCell)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (id, v) => org.apache.spark.sql.Row(id, v) }, 8),
        schema)
      val got = Similarity.semDedupScaled(df, 0.4, targetCell, maxCell)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      val want = refKept(rows, c, 0.4, maxCell)
      // null-embedding rows: the kernel keeps them (cannot be dominated)
      assert(got.size == n)
      val diff = (0L until n.toLong).filter(id => got(id) != want(id))
      assert(diff.isEmpty, s"trial $trial mismatched ids: ${diff.take(10)}")
      assert(got.values.count(_ == false) > 0, s"trial $trial elected nobody")
    }
  }
}
