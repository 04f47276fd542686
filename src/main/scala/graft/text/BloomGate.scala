package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership gate — the same Catalyst machinery Spark's
  * own runtime row-level filtering injects (`BloomFilterAggregate` +
  * `BloomFilterMightContain` over xxhash64), exposed as an operator
  * for PRE-FILTER → EXACT-VERIFY pipelines: the bloom cuts the
  * big-side rows entering a join by orders of magnitude, and an exact
  * join over the surviving candidates removes the false positives, so
  * the composed result is EXACT (oracle-checkable) while the shuffle
  * carries only candidates.
  *
  * This is the 100 TB decontamination shape: a 10⁹-gram eval set
  * doesn't broadcast as rows, but its bloom is a few hundred MB and
  * the corpus-side scan drops non-candidates before any shuffle.
  *
  * The build is fully distributed (partial sketches merge in the
  * aggregate buffer); only the final serialized filter (numBits/8
  * bytes) reaches the driver.
  */
object BloomGate {

  /** Build a serialized bloom filter over `c`'s values (distributed
    * aggregate; one small sketch to the driver).
    */
  def build(df: DataFrame, c: Column, expectedItems: Long,
            bitsPerItem: Int = 10): Array[Byte] = {
    val agg = BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(c)),
      Literal(expectedItems), Literal(expectedItems * bitsPerItem), 0, 0)
    df.agg(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
  }

  /** Membership predicate against a built filter — a codegen'd
    * Catalyst expression (no UDF); false positives possible, false
    * negatives not, so always pair with an exact verify join.
    */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(c))))
}
