package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.RangeJoin

/** Property test: binned range/overlap joins vs naive quadratic joins
  * over random points, intervals (incl. negatives and zero-length),
  * and bin widths — fixed seeds (deterministic).
  */
class RangeJoinPropSpec extends SparkSpec {
  import spark.implicits._

  private val caseGen: Gen[(Seq[(Long, Long)], Seq[(Long, Long, Long)], Long)] =
    for {
      np <- Gen.choose(5, 60)
      ni <- Gen.choose(3, 40)
      pts <- Gen.listOfN(np, Gen.choose(-500L, 500L))
      ivs <- Gen.listOfN(ni, for {
        lo <- Gen.choose(-500L, 500L)
        span <- Gen.choose(0L, 120L)
      } yield (lo, lo + span))
      w <- Gen.oneOf(7L, 50L, 131L)
    } yield (
      pts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) },
      w)

  test("binned point-in-interval join equals naive at random widths") {
    var seed = Seed(777L)
    (1 to 6).foreach { caseNo =>
      val (c, next) = caseGen.apply(Gen.Parameters.default, seed)
        .map(x => (x, seed.next)).getOrElse(fail("gen"))
      seed = next
      val (pts, ivs, w) = c
      val p = pts.toDF("pid", "t")
      val iv = ivs.toDF("iid", "lo", "hi")
      val naive = p.crossJoin(iv)
        .filter(col("t") >= col("lo") && col("t") <= col("hi"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = RangeJoin.binned(p, iv, Seq(), "t", "lo", "hi", w)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size == got.toSet.size, s"case $caseNo: duplicates at w=$w")
      assert(got.toSet == naive, s"case $caseNo: mismatch at w=$w")
    }
  }

  test("binned interval-overlap join equals naive at random widths") {
    var seed = Seed(888L)
    (1 to 6).foreach { caseNo =>
      val (c, next) = caseGen.apply(Gen.Parameters.default, seed)
        .map(x => (x, seed.next)).getOrElse(fail("gen"))
      seed = next
      val (_, ivs, w) = c
      val a = ivs.toDF("ida", "loa", "hia")
      val b = ivs.map { case (i, lo, hi) => (i + 1000L, lo - 13L, hi + 7L) }
        .toDF("idb", "lob", "hib")
      val naive = a.crossJoin(b)
        .filter(col("loa") <= col("hib") && col("lob") <= col("hia"))
        .select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = RangeJoin.overlapBinned(a, b, Seq(), "loa", "hia", "lob", "hib", w)
        .select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size == got.toSet.size, s"case $caseNo: duplicates at w=$w")
      assert(got.toSet == naive, s"case $caseNo: mismatch at w=$w")
    }
  }
}
