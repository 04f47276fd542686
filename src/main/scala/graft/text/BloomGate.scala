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

  private val MaxItemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
  private val MaxBitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"

  /** Build a serialized bloom filter over `c`'s values (distributed
    * aggregate; one small sketch to the driver).
    *
    * `BloomFilterAggregate` silently CLAMPS its size arguments to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits`
    * (defaults 4M items / 64M bits). A clamped filter saturates on a
    * large build set and passes nearly everything — results stay exact
    * through the verify join, but the scan-side gating silently
    * disappears. So the build RAISES those confs to cover
    * `expectedItems × bitsPerItem` for the duration of the aggregate
    * (SQLConf propagates to the executors running it) and restores
    * them after. At 10⁹ grams × 10 bits that is a ~1.2 GB filter —
    * still broadcastable, but size `bitsPerItem` deliberately.
    */
  def build(df: DataFrame, c: Column, expectedItems: Long,
            bitsPerItem: Int = 10): Array[Byte] = {
    require(expectedItems > 0 && bitsPerItem > 0,
      s"bloom sizing must be positive: items=$expectedItems bits/item=$bitsPerItem")
    val numBits = expectedItems * bitsPerItem
    val conf = df.sparkSession.conf
    val oldItems = conf.getOption(MaxItemsKey)
    val oldBits = conf.getOption(MaxBitsKey)
    def restore(key: String, old: Option[String]): Unit =
      old match { case Some(v) => conf.set(key, v); case None => conf.unset(key) }
    try {
      if (oldItems.forall(_.toLong < expectedItems))
        conf.set(MaxItemsKey, expectedItems.toString)
      if (oldBits.forall(_.toLong < numBits))
        conf.set(MaxBitsKey, numBits.toString)
      val agg = BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(c)),
        Literal(expectedItems), Literal(numBits), 0, 0)
      df.agg(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
        .head.getAs[Array[Byte]](0)
    } finally {
      restore(MaxItemsKey, oldItems)
      restore(MaxBitsKey, oldBits)
    }
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
