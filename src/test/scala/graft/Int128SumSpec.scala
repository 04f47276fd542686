package graft

import org.apache.spark.sql.functions._
import graft.functions.{Int128Sum, Num}

/** Pins the int128 money-sum kernel to the DECIMAL formulation it
  * replaced: same exact value, same rounding, same null/empty
  * semantics — including limb-overflow (carry) paths a realistic
  * corpus never exercises.
  */
class Int128SumSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def centsDf(vs: Seq[java.lang.Long], parts: Int = 4) = {
    val rows = vs.map(org.apache.spark.sql.Row(_)).asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType, nullable = true)))
    spark.createDataFrame(rows, schema).repartition(parts)
  }

  private def int128(vs: Seq[java.lang.Long], scale: Int): Option[BigDecimal] = {
    val r = centsDf(vs).agg(Int128Sum(col("v"), scale).as("s")).collect()(0)
    if (r.isNullAt(0)) None else Some(BigDecimal(r.getDecimal(0)))
  }

  private def exact(vs: Seq[java.lang.Long], scale: Int): Option[BigDecimal] = {
    val nn = vs.filter(_ != null).map(v => BigInt(v.longValue()))
    if (nn.isEmpty) None
    else Some(BigDecimal(nn.sum) / BigDecimal(10).pow(scale))
  }

  test("int128 sum ≡ exact BigInt sum on random signed longs incl. carry paths") {
    val rnd = new scala.util.Random(42)
    // magnitudes spanning the lo-limb boundary: many adds of ~2^61
    // values force carries in update AND merge
    val cases: Seq[Seq[java.lang.Long]] = Seq(
      Seq.fill(50)(java.lang.Long.valueOf(rnd.nextLong() / 4)),
      Seq.fill(200)(java.lang.Long.valueOf((1L << 61) + rnd.nextInt(1000))),
      Seq.fill(200)(java.lang.Long.valueOf(-(1L << 61) - rnd.nextInt(1000))),
      Seq.tabulate(100)(i => java.lang.Long.valueOf(if (i % 2 == 0) Long.MaxValue / 2 else Long.MinValue / 2)),
      Seq(java.lang.Long.valueOf(Long.MaxValue), java.lang.Long.valueOf(Long.MaxValue),
        java.lang.Long.valueOf(Long.MinValue), null,
        java.lang.Long.valueOf(7L)))
    cases.zipWithIndex.foreach { case (vs, i) =>
      assert(int128(vs, 2).map(_.setScale(6)) == exact(vs, 2).map(_.setScale(6)), s"case $i")
    }
  }

  test("null/empty contract matches the decimal sum: all-null and empty → null") {
    assert(int128(Seq(null, null), 2).isEmpty)
    assert(int128(Seq.empty, 4).isEmpty)
    assert(int128(Seq(java.lang.Long.valueOf(0L), null), 2).contains(BigDecimal(0).setScale(6)))
  }

  test("Num.sumMoney/sumRevenue ≡ the DECIMAL(12,2) formulation on lineitem") {
    val li = Tables.lineitem(spark, sf)
    val fast = li.groupBy("l_returnflag", "l_linestatus")
      .agg(Num.sumMoney(col("l_quantity")).as("q"),
        Num.sumMoney(col("l_extendedprice")).as("p"),
        Num.sumRevenue(col("l_extendedprice"), col("l_discount")).as("r"),
        Num.sumPriceTimes(col("l_extendedprice"), col("l_discount")).as("t"),
        Num.avgMoney(col("l_extendedprice")).as("a"))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val slow = li.groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum(Num.dec2(col("l_quantity"))), 2).cast("double").as("q"),
        round(sum(Num.dec2(col("l_extendedprice"))), 2).cast("double").as("p"),
        round(sum(Num.dec2(col("l_extendedprice")) * (lit(1) - Num.dec2(col("l_discount")))), 2).cast("double").as("r"),
        round(sum(Num.dec2(col("l_extendedprice")) * Num.dec2(col("l_discount"))), 2).cast("double").as("t"),
        Num.rnd(sum(Num.dec2(col("l_extendedprice"))).cast("double") / count(col("l_extendedprice")), 6).as("a"))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(fast == slow && fast.nonEmpty)
  }

  test("partial-agg tree invariance: 1 vs 13 partitions, same exact result") {
    val vs = Seq.fill(500)(java.lang.Long.valueOf(new scala.util.Random(7).nextLong() / 8))
    val a = centsDf(vs, 1).agg(Int128Sum(col("v"), 4)).collect()(0).getDecimal(0)
    val b = centsDf(vs, 13).agg(Int128Sum(col("v"), 4)).collect()(0).getDecimal(0)
    assert(a == b)
  }
}
