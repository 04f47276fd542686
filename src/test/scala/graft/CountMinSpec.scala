package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin

class CountMinSpec extends SparkSpec {

  private def sketchAndExact(part: Int) = {
    val ev = Tables.events(spark, sf)
      .select(col("user_id").cast("string").as("k"))
      .repartition(part)
    val sk = ev.select(CountMin.buckets(col("k")).as("bs"))
      .agg(CountMin.sketch(col("bs")).as("sk"))
    val exact = ev.groupBy("k").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = ev.select(col("k")).distinct()
      .crossJoin(broadcast(sk))
      .select(col("k"), CountMin.estimate(col("sk"), col("k")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (est, exact)
  }

  test("CMS never underestimates and meets the ε·N error envelope") {
    val (est, exact) = sketchAndExact(4)
    val n = exact.values.sum
    // ε = e/w with w=256; allow the full d-row bound (δ is tiny at d=4)
    val eps = math.E / CountMin.W
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"underestimate for $k: ${est(k)} < $c")
      assert(est(k) <= c + (eps * n).ceil.toLong + 1,
        s"estimate ${est(k)} for $k breaks the ε·N bound (exact $c, N=$n)")
    }
  }

  test("sketch is merge-invariant under repartitioning") {
    def grid(part: Int): Seq[Long] = {
      val ev = Tables.events(spark, sf)
        .select(col("user_id").cast("string").as("k")).repartition(part)
      ev.select(CountMin.buckets(col("k")).as("bs"))
        .agg(CountMin.sketch(col("bs")).as("sk"))
        .head().getSeq[Long](0)
    }
    assert(grid(1) === grid(7))
  }

  test("grid totals: every hash row sums to the row count") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id").cast("string").as("k"))
    val n = ev.count()
    val g = ev.select(CountMin.buckets(col("k")).as("bs"))
      .agg(CountMin.sketch(col("bs")).as("sk")).head().getSeq[Long](0)
    (0 until CountMin.D).foreach { r =>
      val rowSum = g.slice(r * CountMin.W, (r + 1) * CountMin.W).sum
      assert(rowSum === n, s"hash row $r sums to $rowSum, expected $n")
    }
  }
}
