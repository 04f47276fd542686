package graft

import org.apache.spark.sql.functions._
import graft.api.syntax._

class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  test("column syntax delegates to pandas-semantics functions") {
    val df = Seq((-7L, "ab", 2.5), (14L, "CD", Double.NaN)).toDF("k", "s", "x")
    val r = df.select(
      $"k".pyMod(3L).as("m"),
      $"k".floorDiv(lit(4)).as("fd"),
      $"x".isna.as("na"),
      $"s".strSwapcase.as("sw"),
      $"s".zfill(4).as("z"),
      $"k".astype("string").as("ks")).collect()
    assert(r(0).getLong(0) === 2L)      // -7 mod 3 = 2
    assert(r(0).getLong(1) === -2L)     // floor(-7/4)
    assert(!r(0).getBoolean(2) && r(1).getBoolean(2))
    assert(r(0).getString(3) === "AB" && r(1).getString(3) === "cd")
    assert(r(0).getString(4) === "00ab")
    assert(r(0).getString(5) === "-7")
  }
}
