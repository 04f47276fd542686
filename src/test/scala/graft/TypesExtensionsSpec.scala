package graft

import org.apache.spark.sql.types._
import graft.plans.GraftExtensions

class TypesExtensionsSpec extends SparkSpec {

  test("promotion lattice follows numpy rules") {
    assert(Types.promote(IntegerType, LongType) === LongType)
    assert(Types.promote(LongType, FloatType) === DoubleType)
    assert(Types.promote(BooleanType, IntegerType) === IntegerType)
    assert(Types.promote(FloatType, DoubleType) === DoubleType)
    assert(Types.promote(StringType, IntegerType) === StringType)
  }

  test("reduction result dtypes match the reference") {
    assert(Types.reductionType("count", ByteType) === LongType)
    assert(Types.reductionType("mean", IntegerType) === DoubleType)
    assert(Types.reductionType("any", DoubleType) === BooleanType)
    assert(Types.reductionType("sum", FloatType) === FloatType)
  }

  test("simhash64 registered as a SQL function") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT simhash64(split('a b c', ' ')) AS h1, simhash64(split('a b c', ' ')) AS h2")
      .head()
    assert(r.getLong(0) === r.getLong(1))
  }
}
