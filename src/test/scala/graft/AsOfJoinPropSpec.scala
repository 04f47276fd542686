package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.AsOfJoin

/** Property test: merge_asof backward/forward/nearest (+tolerance) vs a
  * driver-side reference scan over random keyed series — fixed seeds
  * (deterministic). Complements AsOfJoinSpec's example-based checks.
  */
class AsOfJoinPropSpec extends SparkSpec {
  import spark.implicits._

  private val caseGen: Gen[(Seq[(Long, Long)], Seq[(Long, Long, Double)], Option[Long])] =
    for {
      nl <- Gen.choose(5, 50)
      nr <- Gen.choose(3, 40)
      nkeys <- Gen.choose(1, 4)
      left <- Gen.listOfN(nl, for {
        k <- Gen.choose(0L, nkeys.toLong - 1)
        t <- Gen.choose(0L, 300L)
      } yield (k, t))
      right <- Gen.listOfN(nr, for {
        k <- Gen.choose(0L, nkeys.toLong - 1)
        t <- Gen.choose(0L, 300L)
      } yield (k, t))
      tol <- Gen.oneOf(None, Some(20L), Some(75L))
    } yield (
      left.distinct,
      // unique (key, time) on the right so the expected value is unambiguous
      right.distinct.map { case (k, t) => (k, t, (k * 1000 + t).toDouble) },
      tol)

  private def reference(dir: String,
                        left: Seq[(Long, Long)],
                        right: Seq[(Long, Long, Double)],
                        tol: Option[Long]): Map[(Long, Long), Option[Double]] =
    left.map { case (k, t) =>
      val cands = right.filter(_._1 == k).filter { case (_, rt, _) =>
        dir match {
          case "backward" => rt <= t && tol.forall(x => t - rt <= x)
          case "forward"  => rt >= t && tol.forall(x => rt - t <= x)
          case "nearest"  => tol.forall(x => math.abs(rt - t) <= x)
        }
      }
      val pick = dir match {
        case "backward" => cands.sortBy(_._2).lastOption
        case "forward"  => cands.sortBy(_._2).headOption
        case "nearest"  =>
          // smallest |dt|, ties resolved backward (smaller rt)
          cands.sortBy(c => (math.abs(c._2 - t), c._2)).headOption
      }
      (k, t) -> pick.map(_._3)
    }.toMap

  test("asof backward/forward/nearest match a driver scan on random series") {
    var seed = Seed(31337L)
    (1 to 5).foreach { caseNo =>
      val (c, next) = caseGen.apply(Gen.Parameters.default, seed)
        .map(x => (x, seed.next)).getOrElse(fail("gen"))
      seed = next
      val (left, right, tol) = c
      if (left.nonEmpty && right.nonEmpty) {
        val l = left.toDF("k", "t")
        val r = right.toDF("k", "rt", "v")
        for (dir <- Seq("backward", "forward", "nearest")) {
          val joined = dir match {
            case "backward" =>
              AsOfJoin.backward(l, r, "k", "t", "rt", Seq("v"), tolerance = tol)
            case "forward" =>
              AsOfJoin.forward(l, r, "k", "t", "rt", Seq("v"), tolerance = tol)
            case "nearest" =>
              AsOfJoin.nearest(l, r, "k", "t", "rt", Seq("v"), tolerance = tol)
          }
          val got = joined.select(col("k"), col("t"), col("v"))
            .collect().map(row => (row.getLong(0), row.getLong(1)) ->
              (if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toMap
          val want = reference(dir, left, right, tol)
          assert(got == want, s"case $caseNo dir=$dir tol=$tol")
        }
      }
    }
  }
}
