package graft

import org.apache.spark.sql.functions._
import graft.operators.GroupAgg

/** Differential tests on the reference test-suite's canonical frame
  * (FIXTURES.md §2: c1/c2 payloads, c3 = cycling low-cardinality key
  * forcing duplicate groups, null variants) — expectations computed
  * independently in plain Scala, mirroring how the reference diffs
  * against real pandas (reference `tests/utils.py:20-61`, tolerance
  * 1e-10).
  */
class DifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val n = 32
  private val keyCycle = Seq(1L, 4L, 2L, 3L, 1L, 3L, 1L)
  private val rows: Seq[(Long, Long, Long)] =
    (0 until n).map(i => (i.toLong * 7 % 19 - 9, i.toLong, keyCycle(i % keyCycle.size)))
  private lazy val df = rows.toDF("c1", "c2", "c3")

  private def expected[T](f: Seq[(Long, Long, Long)] => T): Map[Long, T] =
    rows.groupBy(_._3).map { case (k, g) => k -> f(g) }

  test("groupby sum/count/mean/var/std match independent computation") {
    val got = GroupAgg.agg(df, Seq("c3"), Seq("c1" -> Seq("sum", "count", "mean", "var", "std")))
      .collect().map(r => r.getLong(0) -> r).toMap
    val eSum = expected(_.map(_._1).sum)
    val eCnt = expected(_.size.toLong)
    val eMean = expected(g => g.map(_._1).sum.toDouble / g.size)
    val eVar = expected { g =>
      val m = g.map(_._1).sum.toDouble / g.size
      g.map(x => math.pow(x._1 - m, 2)).sum / (g.size - 1) // ddof=1
    }
    got.foreach { case (k, r) =>
      assert(r.getLong(1) === eSum(k), s"sum k=$k")
      assert(r.getLong(2) === eCnt(k), s"count k=$k")
      assert(math.abs(r.getDouble(3) - eMean(k)) < 1e-10, s"mean k=$k")
      assert(math.abs(r.getDouble(4) - eVar(k)) < 1e-10, s"var k=$k")
      assert(math.abs(r.getDouble(5) - math.sqrt(eVar(k))) < 1e-10, s"std k=$k")
    }
  }

  test("groupby with nulls skips them like pandas (skipna)") {
    val withNulls = df.withColumn("c1n",
      when(col("c2") % 5 === 0, lit(null)).otherwise(col("c1").cast("double")))
    val got = withNulls.groupBy("c3")
      .agg(sum("c1n").as("s"), count(col("c1n")).as("n"), avg("c1n").as("m"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val live = rows.filter(r => r._2 % 5 != 0)
    val eSum = live.groupBy(_._3).map { case (k, g) => k -> g.map(_._1).sum.toDouble }
    val eCnt = live.groupBy(_._3).map { case (k, g) => k -> g.size.toLong }
    got.foreach { case (k, r) =>
      assert(r.getDouble(1) === eSum(k), s"sum k=$k")
      assert(r.getLong(2) === eCnt(k), s"count k=$k")
      assert(math.abs(r.getDouble(3) - eSum(k) / eCnt(k)) < 1e-10, s"mean k=$k")
    }
  }

  test("describe() matches manual stats") {
    val desc = graft.api.GFrame(df).describe("c1", "c2")
      .df.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(desc("count")._1 === n.toDouble)
    val m1 = rows.map(_._1).sum.toDouble / n
    assert(math.abs(desc("mean")._1 - m1) < 1e-10)
    assert(desc("min")._2 === 0.0 && desc("max")._2 === (n - 1).toDouble)
  }
}
