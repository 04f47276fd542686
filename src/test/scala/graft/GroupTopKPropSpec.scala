package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests hardening two custom distributed operators against
  * driver-side references on random inputs (fixed seeds):
  *  - GroupTopK (bounded-heap custom SparkPlan) vs sort-and-take
  *  - Cumulative.globalScan (two-phase carry) vs a sequential fold
  */
class GroupTopKPropSpec extends SparkSpec {
  import spark.implicits._

  private val topkGen: Gen[(Seq[(Long, Long, Long)], Int)] = for {
    n <- Gen.choose(20, 300)
    ng <- Gen.choose(1, 8)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0L, ng.toLong - 1)
      v <- Gen.choose(-50L, 50L) // deliberately collisive: ties everywhere
    } yield (g, v))
    k <- Gen.choose(1, 7)
  } yield (rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }, k)

  test("GroupTopK equals sort-and-take per group on random tied data") {
    var seed = Seed(9090L)
    (1 to 6).foreach { caseNo =>
      val (c, next) = topkGen.apply(Gen.Parameters.default, seed)
        .map(x => (x, seed.next)).getOrElse(fail("gen"))
      seed = next
      val (rows, k) = c
      val df = rows.toDF("g", "v", "id")
      val got = graft.plans.GroupTopK.topKPerKey(df, Seq("g"),
          Seq(("v", true), ("id", false)), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(t => (-t._2, t._3)).take(k)
      }.toSet
      assert(got == want, s"case $caseNo k=$k")
    }
  }

  private val scanGen: Gen[Seq[(Long, Option[Double])]] = for {
    n <- Gen.choose(30, 250)
    vals <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(-300, 300).map(c => Some(c / 10.0)),
      1 -> Gen.const(Some(Double.NaN)),
      1 -> Gen.const(Option.empty[Double])))
  } yield vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  test("globalScan cumsum/cummin/cummax match a sequential fold incl. null/NaN skip") {
    import graft.operators.Cumulative
    var seed = Seed(77331L)
    (1 to 4).foreach { caseNo =>
      val (rows, next) = scanGen.apply(Gen.Parameters.default, seed)
        .map(x => (x, seed.next)).getOrElse(fail("gen"))
      seed = next
      val df = rows.toDF("id", "v")
      for ((op, fold) <- Seq[(Cumulative.ScanOp, (Double, Double) => Double)](
          (Cumulative.SumOp, _ + _),
          (Cumulative.MinOp, math.min),
          (Cumulative.MaxOp, math.max))) {
        val got = Cumulative.globalScan(df, Seq("id"), "v", "c", op)
          .select(col("id"), col("c"))
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
        var acc = op.zero
        rows.foreach { case (id, v) =>
          val valid = v.exists(x => !x.isNaN)
          if (valid) acc = fold(acc, v.get)
          val want = if (!valid) None else Some(acc)
          assert(got(id).isDefined == want.isDefined, s"case $caseNo $op null at $id")
          (got(id), want) match {
            case (Some(a), Some(b)) =>
              assert(math.abs(a - b) < 1e-9, s"case $caseNo $op at $id: $a vs $b")
            case _ =>
          }
        }
      }
    }
  }
}
