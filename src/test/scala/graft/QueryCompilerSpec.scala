package graft

import org.apache.spark.sql.functions._
import graft.expr.QueryCompiler

class QueryCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "a"), (4L, -5.0, "c"))
    .toDF("k", "v", "s")

  test("in / not in with list literals and @refs") {
    assert(QueryCompiler.query(df, "s in ['a', 'c']").count() === 3)
    assert(QueryCompiler.query(df, "s not in ['a', 'c']").count() === 1)
    assert(QueryCompiler.query(df, "k in [1, 3, -4]").count() === 2)
    assert(QueryCompiler.query(df, "v in [10.0, -5.0]").count() === 2)
    assert(QueryCompiler.query(df, "s in @allowed and v > 5",
      Map("allowed" -> Seq("a", "b"))).count() === 3)
    assert(QueryCompiler.query(df, "k not in @ks",
      Map("ks" -> Seq(1L, 2L))).count() === 2)
    intercept[IllegalArgumentException] {
      QueryCompiler.compile("s in 5")
    }
    intercept[IllegalArgumentException] {
      QueryCompiler.compile("s in [1,")
    }
  }

  test("comparison and boolean operators") {
    assert(QueryCompiler.query(df, "v > 10 & s == 'a'").count() === 1)
    assert(QueryCompiler.query(df, "v > 10 | s == 'a'").count() === 3)
    assert(QueryCompiler.query(df, "~(v > 10)").count() === 2)
    assert(QueryCompiler.query(df, "v >= 10 and v <= 20").count() === 2)
  }

  test("arithmetic with pandas semantics") {
    // truediv yields double; floordiv floors; ** is power
    assert(QueryCompiler.query(df, "k / 2 == 1.5").count() === 1)   // k=3
    assert(QueryCompiler.query(df, "k // 2 == 1").count() === 2)    // k=2,3
    assert(QueryCompiler.query(df, "k ** 2 == 9").count() === 1)
    assert(QueryCompiler.query(df, "v % 7 == 2").count() === 2)     // 30%7=2 and -5 mod 7 = 2 (Python sign)
  }

  test("@refs and precedence") {
    assert(QueryCompiler.query(df, "v > @lo & v < @hi",
      Map("lo" -> 5, "hi" -> 25)).count() === 2)
    // comparison binds tighter than &
    assert(QueryCompiler.query(df, "k > 1 & k < 4").count() === 2)
  }

  test("errors") {
    intercept[IllegalArgumentException](QueryCompiler.compile("v > @missing"))
    intercept[IllegalArgumentException](QueryCompiler.compile("v >"))
    intercept[IllegalArgumentException](QueryCompiler.compile("v 5"))
  }
}
