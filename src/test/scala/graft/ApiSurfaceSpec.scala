package graft

import org.apache.spark.sql.functions._
import graft.api.GFrame
import graft.functions.StringOps
import graft.expr.QueryCompiler

/** Coverage for surface paths not exercised elsewhere: GFrame
  * where/mask/isna/valueCounts edge behavior, GGroupBy.size, boolean
  * literals in query(), lstrip/rstrip, Types map completeness.
  */
class ApiSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "a")).toDF("k", "v", "s")

  test("GFrame where nulls-out non-matching values, mask inverts") {
    val g = GFrame(df).setIndex("k")
    val w = g.where(col("v") > 15).df
    assert(w.filter(col("v").isNull).count() === 1)
    assert(w.filter(col("s").isNull).count() === 1)
    val m = g.mask(col("v") > 15).df
    assert(m.filter(col("v").isNull).count() === 2)
    // index column untouched in both
    assert(w.filter(col("k").isNull).count() === 0)
  }

  test("GFrame isna produces boolean frame over data columns") {
    val withNull = df.withColumn("v", when(col("k") === 2, lit(null)).otherwise(col("v")))
    val na = GFrame(withNull).setIndex("k").isna().df
    assert(na.schema("v").dataType === org.apache.spark.sql.types.BooleanType)
    assert(na.filter(col("v")).count() === 1)
  }

  test("GGroupBy.size counts rows per group") {
    val sizes = GFrame(df).groupby("s").size().df
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes === Map("a" -> 2L, "b" -> 1L))
  }

  test("query() supports True/False literals and unary plus") {
    assert(QueryCompiler.query(df.withColumn("f", col("k") > 1), "f == True").count() === 2)
    assert(QueryCompiler.query(df, "+k > 1").count() === 2)
  }

  test("lstrip/rstrip") {
    val r = Seq("  x  ").toDF("s").select(
      StringOps.lstrip(col("s")).as("l"), StringOps.rstrip(col("s")).as("r")).head()
    assert(r.getString(0) === "x  " && r.getString(1) === "  x")
  }

  test("Types.toSpark covers the reference dtype list") {
    val expected = Seq("bool", "int8", "int16", "int32", "int64",
      "uint8", "uint16", "uint32", "uint64", "float32", "float64",
      "datetime64[ns]", "string", "category")
    expected.foreach(t => assert(Types.toSpark.contains(t), t))
  }

  test("GFrame describe/nunique/valueCounts do not mutate source") {
    val g = GFrame(df)
    g.describe("v")
    g.nunique()
    assert(g.df.count() === 3)
  }

  test("metadata surface: keys/axes/ndim/empty/shape/bool/hasnans/append") {
    val g = GFrame(df).setIndex("k")
    assert(g.keys == Seq("v", "s"))
    assert(g.axes == (Seq("k"), Seq("v", "s")))
    assert(g.ndim == 2)
    // reference empty = NO DATA COLUMNS (frame.py:148-151), not no rows
    assert(!g.empty)
    assert(GFrame(df.select("k")).setIndex("k").empty)
    assert(!GFrame(df.filter(col("k") > 100)).empty) // rows=0, cols>0 → false
    assert(g.shape == (3L, 2))
    // bool(): 1×1 only
    val one = GFrame(Seq(true).toDF("f"))
    assert(one.boolScalar())
    intercept[IllegalArgumentException] { g.boolScalar() }
    intercept[IllegalArgumentException] {
      GFrame(Seq(true, false).toDF("f")).boolScalar()
    }
    // hasnans catches null AND NaN
    val withNan = df.withColumn("v",
      when(col("k") === 2, lit(Double.NaN)).otherwise(col("v")))
    assert(GFrame(withNan).hasnans("v"))
    assert(!GFrame(df).hasnans("v"))
    // append = concat(axis=0)
    assert(g.append(g).df.count() == 6L)
  }
}
