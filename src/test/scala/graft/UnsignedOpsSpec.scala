package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.UnsignedOps

/** Unsigned lattice: numpy-named promotion and wraparound arithmetic,
  * cross-checked exactly against BigInt on boundary-heavy operands.
  */
class UnsignedOpsSpec extends SparkSpec {

  test("promoteNamed matches numpy find_common_type") {
    val cases = Seq(
      ("uint8", "uint8") -> "uint8",
      ("uint8", "uint16") -> "uint16",
      ("uint32", "uint64") -> "uint64",
      ("uint8", "int8") -> "int16",
      ("uint8", "int16") -> "int16",
      ("uint8", "int64") -> "int64",
      ("uint16", "int8") -> "int32",
      ("uint16", "int32") -> "int32",
      ("uint32", "int32") -> "int64",
      ("uint32", "int64") -> "int64",
      ("uint64", "int8") -> "float64",
      ("uint64", "int64") -> "float64",
      ("uint64", "uint64") -> "uint64",
      ("uint8", "float32") -> "float32",
      ("uint16", "float32") -> "float32",
      ("uint32", "float32") -> "float64",
      ("uint64", "float32") -> "float64",
      ("uint32", "float64") -> "float64",
      ("int8", "int32") -> "int32",
      ("int64", "float32") -> "float64",
      ("bool", "uint8") -> "uint8",
      ("bool", "float32") -> "float32")
    for (((a, b), want) <- cases) {
      assert(Types.promoteNamed(a, b) == want, s"$a+$b")
      assert(Types.promoteNamed(b, a) == want, s"$b+$a (sym)")
    }
  }

  test("promoteNamed matches numpy result_type on ALL 121 pairs") {
    for ((a, b, want) <- NumpyPromotionTable.cells)
      assert(Types.promoteNamed(a, b) == want, s"result_type($a, $b)")
  }

  test("storage types mirror the Types lattice") {
    assert(UnsignedOps.storageType(8) == Types.toSpark("uint8"))
    assert(UnsignedOps.storageType(16) == Types.toSpark("uint16"))
    assert(UnsignedOps.storageType(32) == Types.toSpark("uint32"))
    assert(UnsignedOps.storageType(64) == Types.toSpark("uint64"))
  }

  test("uadd/usub/umul wrap exactly like BigInt mod 2^N") {
    import spark.implicits._
    // boundary-heavy operand pairs per width
    def vals(bits: Int): Seq[(BigInt, BigInt)] = {
      val m = BigInt(1) << bits
      Seq(
        (BigInt(0), BigInt(0)), (m - 1, m - 1), (m - 1, BigInt(1)),
        (m / 2, m / 2), (BigInt(1), m - 2), (m - 3, m / 2 + 7),
        (BigInt(12345) % m, BigInt(67891) % m))
    }
    for (bits <- Seq(8, 16, 32, 64)) {
      val m = BigInt(1) << bits
      val in = vals(bits)
      val df = in.zipWithIndex
        .map { case ((a, b), i) => (i, a.toString, b.toString) }
        .toDF("i", "as", "bs")
        .select(col("i"),
          col("as").cast(DecimalType(20, 0)).cast(UnsignedOps.storageType(bits)).as("a"),
          col("bs").cast(DecimalType(20, 0)).cast(UnsignedOps.storageType(bits)).as("b"))
      val got = df.select(col("i"),
          UnsignedOps.uadd(col("a"), col("b"), bits).cast("string").as("add"),
          UnsignedOps.usub(col("a"), col("b"), bits).cast("string").as("sub"),
          UnsignedOps.umul(col("a"), col("b"), bits).cast("string").as("mul"))
        .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
      for (((a, b), i) <- in.zipWithIndex) {
        val want = (
          ((a + b) mod m).toString,
          ((a - b) mod m).toString,
          ((a * b) mod m).toString)
        assert(got(i) == want, s"uint$bits a=$a b=$b")
      }
    }
  }

  test("randomized wraparound: 80 random pairs per width vs BigInt") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val rng = new scala.util.Random(2026)
    for (bits <- Seq(8, 16, 32, 64)) {
      val m = BigInt(1) << bits
      val in = (0 until 80).map { _ =>
        (BigInt(bits, rng), BigInt(bits, rng))
      }
      val df = in.zipWithIndex
        .map { case ((a, b), i) => (i, a.toString, b.toString) }
        .toDF("i", "as", "bs")
        .select(col("i"),
          col("as").cast(DecimalType(20, 0)).cast(UnsignedOps.storageType(bits)).as("a"),
          col("bs").cast(DecimalType(20, 0)).cast(UnsignedOps.storageType(bits)).as("b"))
      val got = df.select(col("i"),
          UnsignedOps.uadd(col("a"), col("b"), bits).cast("string").as("add"),
          UnsignedOps.usub(col("a"), col("b"), bits).cast("string").as("sub"),
          UnsignedOps.umul(col("a"), col("b"), bits).cast("string").as("mul"))
        .collect().map(r => r.getInt(0) ->
          (r.getString(1), r.getString(2), r.getString(3))).toMap
      for (((a, b), i) <- in.zipWithIndex) {
        val want = (((a + b) mod m).toString, ((a - b) mod m).toString,
          ((a * b) mod m).toString)
        assert(got(i) == want, s"uint$bits a=$a b=$b")
      }
    }
  }

  test("fixture scan widens along the lattice and preserves extremes") {
    val f = Tables.uintFixture(spark)
    val types = f.schema.fields.map(x => x.name -> x.dataType).toMap
    assert(types("u8") == ShortType && types("u16") == IntegerType &&
      types("u32") == LongType && types("u64") == DecimalType(20, 0))
    val r = f.agg(max(col("u8")), max(col("u16")), max(col("u32")),
      max(col("u64")).cast("string"), min(col("u64")).cast("string"))
      .collect()(0)
    assert(r.getShort(0) == 255 && r.getInt(1) == 65535 &&
      r.getLong(2) == 4294967295L &&
      r.getString(3) == "18446744073709551615" && r.getString(4) == "0")
  }
}
