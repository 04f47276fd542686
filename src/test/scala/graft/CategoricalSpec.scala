package graft

import org.apache.spark.sql.functions._
import graft.operators.{Categorical, CategoricalDtype}

/** pandas `.cat` accessor semantics (reference frontend/accessors.py,
  * core/column.py dictionary ops).
  */
class CategoricalSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq("b", "a", "c", "a", null, "b")
    .map(Tuple1(_)).toDF("v")

  test("infer builds the sorted dictionary; codes are positions, null/unknown -1") {
    val dt = Categorical.infer(frame, "v")
    assert(dt.categories === IndexedSeq("a", "b", "c"))
    val got = frame.select(dt.codes(col("v"))).collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 0, 2, 0, -1, 1))
  }

  test("dictionary collects fail fast above spark.graft.maxCategories") {
    val wide = spark.range(0, 50).toDF("id")
      .select(concat(lit("v"), col("id")).as("v"))
    spark.conf.set(Categorical.MaxCategoriesConf, "10")
    try {
      val e = intercept[IllegalArgumentException](Categorical.infer(wide, "v"))
      assert(e.getMessage.contains(Categorical.MaxCategoriesConf))
      val e2 = intercept[IllegalArgumentException](
        graft.api.GFrame(wide).getDummies("v"))
      assert(e2.getMessage.contains("get_dummies"))
      // at exactly the cap the collect still succeeds
      spark.conf.set(Categorical.MaxCategoriesConf, "50")
      assert(Categorical.infer(wide, "v").categories.length === 50)
    } finally spark.conf.unset(Categorical.MaxCategoriesConf)
  }

  test("rename_categories relabels without recoding") {
    val dt = CategoricalDtype(IndexedSeq("a", "b", "c"))
    val ren = Map("a" -> "alpha", "c" -> "gamma")
    val dt2 = dt.renameCategories(ren)
    assert(dt2.categories === IndexedSeq("alpha", "b", "gamma"))
    val v = dt.renameColumn(col("v"), ren)
    val codes = frame.select(dt2.codes(v)).collect().map(_.getInt(0)).toSeq
    // same codes as the original dictionary produced
    assert(codes === Seq(1, 0, 2, 0, -1, 1))
  }

  test("add_categories appends, keeping existing codes stable") {
    val dt = CategoricalDtype(IndexedSeq("a", "b", "c")).addCategories(Seq("d"))
    assert(dt.categories === IndexedSeq("a", "b", "c", "d"))
    assert(dt.codeOf("d") === 3 && dt.codeOf("a") === 0)
    intercept[IllegalArgumentException] {
      dt.addCategories(Seq("a"))
    }
  }

  test("remove_categories nulls removed values and recompacts codes") {
    val dt = CategoricalDtype(IndexedSeq("a", "b", "c"))
    val dt2 = dt.removeCategories(Seq("b"))
    assert(dt2.categories === IndexedSeq("a", "c"))
    val v = dt.removeColumn(col("v"), Seq("b"))
    val got = frame.select(v.as("v"), dt2.codes(v).as("c"))
      .collect().map(r => (Option(r.getString(0)), r.getInt(1))).toSeq
    assert(got === Seq((None, -1), (Some("a"), 0), (Some("c"), 1),
      (Some("a"), 0), (None, -1), (None, -1)))
  }

  test("ordered comparisons rank by dictionary position, not collation") {
    // logical order: low < medium < high — lexically 'high' < 'low'!
    val dt = CategoricalDtype(IndexedSeq("low", "medium", "high"), ordered = true)
    val df = Seq("low", "medium", "high").map(Tuple1(_)).toDF("v")
    val got = df.select(dt.geq(col("v"), "medium")).collect().map(_.getBoolean(0)).toSeq
    assert(got === Seq(false, true, true))
    // unordered comparison raises, like pandas
    intercept[IllegalArgumentException] {
      CategoricalDtype(IndexedSeq("low", "high")).lt(col("v"), "high")
    }
  }

  test("GFrame astypeCategory + catCodes round the accessor surface") {
    import graft.api.GFrame
    val (g, dt) = GFrame(frame).astypeCategory("v")
    assert(dt.categories === IndexedSeq("a", "b", "c"))
    val got = g.catCodes("v", dt, "code").df
      .select("code").collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 0, 2, 0, -1, 1))
  }

  test("reorder_categories keeps the set, changes the code assignment") {
    val dt = CategoricalDtype(IndexedSeq("a", "b", "c"))
      .reorderCategories(Seq("c", "b", "a"), ordered = true)
    assert(dt.codeOf("c") === 0 && dt.codeOf("a") === 2 && dt.ordered)
    intercept[IllegalArgumentException] {
      dt.reorderCategories(Seq("c", "b"), ordered = false)
    }
  }
}
