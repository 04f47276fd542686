package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the query-string compiler agrees with an independent
  * Scala evaluator over randomly generated expressions — the
  * differential-testing idea of the reference's suite
  * (reference `tests/utils.py`), applied to the grammar itself.
  * Uses raw ScalaCheck generators with fixed seeds (deterministic).
  */
class QueryCompilerPropSpec extends SparkSpec {
  import spark.implicits._
  import graft.expr.QueryCompiler

  private val rows: Seq[(Long, Double)] =
    Seq((1L, 2.0), (-3L, 0.5), (7L, -1.5), (0L, 4.0), (12L, 8.25), (-9L, -3.5))
  private lazy val df = rows.toDF("k", "v").cache()

  // arithmetic term over k/v/constants → (expr string, scala evaluator)
  private type Term = (String, (Long, Double) => Double)
  private val leaf: Gen[Term] = Gen.oneOf[Term](
    ("k", (k: Long, _: Double) => k.toDouble),
    ("v", (_: Long, v: Double) => v),
    ("2", (_: Long, _: Double) => 2.0),
    ("3.5", (_: Long, _: Double) => 3.5))

  private def binop(l: Term, r: Term, op: String): Term = {
    val f: (Double, Double) => Double = op match {
      case "+" => _ + _
      case "-" => _ - _
      case "*" => _ * _
    }
    (s"(${l._1} $op ${r._1})", (k, v) => f(l._2(k, v), r._2(k, v)))
  }

  private def term(depth: Int): Gen[Term] =
    if (depth == 0) leaf
    else Gen.frequency(
      2 -> leaf,
      3 -> (for {
        op <- Gen.oneOf("+", "-", "*")
        l <- term(depth - 1); r <- term(depth - 1)
      } yield binop(l, r, op)))

  private val cmpGen: Gen[(String, (Long, Double) => Boolean)] = for {
    l <- term(2); r <- term(2)
    op <- Gen.oneOf("<", "<=", ">", ">=", "==", "!=")
  } yield {
    val f: (Double, Double) => Boolean = op match {
      case "<" => _ < _; case "<=" => _ <= _
      case ">" => _ > _; case ">=" => _ >= _
      case "==" => _ == _; case "!=" => _ != _
    }
    (s"${l._1} $op ${r._1}", (k: Long, v: Double) => f(l._2(k, v), r._2(k, v)))
  }

  private val boolGen: Gen[(String, (Long, Double) => Boolean)] = for {
    a <- cmpGen; b <- cmpGen
    op <- Gen.oneOf("&", "|")
  } yield (s"(${a._1}) $op (${b._1})",
    (k: Long, v: Double) =>
      if (op == "&") a._2(k, v) && b._2(k, v) else a._2(k, v) || b._2(k, v))

  test("pymod/floordiv satisfy the Python division identity (property)") {
    import graft.functions.PandasArith
    // a == b * (a // b) + (a % b), and a % b has the divisor's sign
    val pairs = for {
      i <- 1 to 100
      seed = Seed(1000L + i)
      a <- Gen.chooseNum(-1000L, 1000L).apply(Gen.Parameters.default, seed)
      b <- Gen.chooseNum(-50L, 50L).suchThat(_ != 0L)
        .apply(Gen.Parameters.default, seed.next)
    } yield (a, b)
    assert(pairs.size >= 80)
    val pdf = pairs.toDF("a", "b")
    val r = pdf.select(
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"),
      PandasArith.floordiv(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).cast("long").as("fd"),
      PandasArith.pymod(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).cast("long").as("pm"))
      .collect()
    r.foreach { row =>
      val (a, b, fd, pm) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      assert(a === b * fd + pm, s"identity failed for a=$a b=$b")
      assert(pm == 0 || (pm > 0) == (b > 0), s"sign rule failed for a=$a b=$b pm=$pm")
      assert(math.abs(pm) < math.abs(b))
    }
  }

  test("chained comparisons follow Python pairwise semantics (property)") {
    // a < b <= c must compile to (a < b) & (b <= c), never ((a < b) <= c)
    val ops = Seq("<", "<=", ">", ">=", "==", "!=")
    def opEval(o: String): (Double, Double) => Boolean = o match {
      case "<" => _ < _; case "<=" => _ <= _
      case ">" => _ > _; case ">=" => _ >= _
      case "==" => _ == _; case "!=" => _ != _
    }
    val chainGen: Gen[(String, (Long, Double) => Boolean)] = for {
      a <- term(1); b <- term(1); c <- term(1)
      o1 <- Gen.oneOf(ops); o2 <- Gen.oneOf(ops)
    } yield (s"${a._1} $o1 ${b._1} $o2 ${c._1}",
      (k: Long, v: Double) => {
        val (x, y, z) = (a._2(k, v), b._2(k, v), c._2(k, v))
        opEval(o1)(x, y) && opEval(o2)(y, z)
      })
    val cases = (1 to 100).flatMap { i =>
      chainGen.apply(Gen.Parameters.default, Seed(7000L + i))
    }
    assert(cases.size >= 80)
    val sumCols = cases.zipWithIndex.map { case ((exprStr, _), i) =>
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          QueryCompiler.compile(exprStr), 1L).otherwise(0L)).as(s"c$i")
    }
    val got = df.agg(sumCols.head, sumCols.tail: _*).head()
    cases.zipWithIndex.foreach { case ((exprStr, eval), i) =>
      val want = rows.count { case (k, v) => eval(k, v) }.toLong
      assert(got.getLong(i) === want, s"expr: $exprStr")
    }
  }

  test("compiled filters match an independent evaluator (120 random exprs)") {
    // evaluate many expressions in ONE Spark job: build all compiled
    // predicates as columns, collect counts in a single pass
    val cases = (1 to 120).flatMap { i =>
      boolGen.apply(Gen.Parameters.default, Seed(42L + i))
    }
    assert(cases.size >= 100)
    val sumCols = cases.zipWithIndex.map { case ((exprStr, _), i) =>
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          QueryCompiler.compile(exprStr), 1L).otherwise(0L)).as(s"c$i")
    }
    val got = df.agg(sumCols.head, sumCols.tail: _*).head()
    cases.zipWithIndex.foreach { case ((exprStr, eval), i) =>
      val want = rows.count { case (k, v) => eval(k, v) }.toLong
      assert(got.getLong(i) === want, s"expr: $exprStr")
    }
  }
}
