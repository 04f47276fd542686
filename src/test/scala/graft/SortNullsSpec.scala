package graft

import org.apache.spark.sql.functions._
import graft.operators.Sorts

/** na_position semantics (§2.6): pandas default puts nulls LAST for
  * both ascending and descending — Spark's asc default is nulls-first,
  * so Sorts must always set placement explicitly.
  */
class SortNullsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq[(Long, java.lang.Double)](
    (1L, 3.0), (2L, null), (3L, 1.0), (4L, null), (5L, 2.0)).toDF("k", "v")

  test("ascending with nulls last (pandas default)") {
    val got = Sorts.sortValues(df, Seq("v"), Seq(true), naLast = true)
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(got.take(3) === Seq(3L, 5L, 1L))
    assert(got.drop(3).toSet === Set(2L, 4L))
  }

  test("descending with nulls last") {
    val got = Sorts.sortValues(df, Seq("v"), Seq(false), naLast = true)
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(got.take(3) === Seq(1L, 5L, 3L))
    assert(got.drop(3).toSet === Set(2L, 4L))
  }

  test("na_position=first") {
    val got = Sorts.sortValues(df, Seq("v"), Seq(true), naLast = false)
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(got.take(2).toSet === Set(2L, 4L))
    assert(got.drop(2) === Seq(3L, 5L, 1L))
  }

  test("GFrame dropRows removes labeled rows") {
    val g = graft.api.GFrame(df).setIndex("k")
    assert(g.dropRows(1L, 4L).df.count() === 3)
  }
}
