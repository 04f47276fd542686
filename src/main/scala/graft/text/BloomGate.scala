package graft.text

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

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
    *
    * The filter bytes travel as a TorrentBroadcast handle, NOT a plan
    * literal: Spark's own `BloomFilterMightContain` takes the bytes as
    * an expression, which embeds megabytes into the plan tree — every
    * AQE stage then re-serializes them into its task binary (observed
    * 5–10 MiB "large task binary" warnings, with inter-stage driver
    * time dwarfing the stage walls), and at the 100 TB sizing (a GB-
    * scale filter) a plan literal is simply not shippable. With the
    * broadcast handle the task binary stays KB-sized and each executor
    * fetches + deserializes the filter once.
    */
  def mightContain(bloom: Array[Byte], c: Column): Column = {
    val bcast = SparkSession.active.sparkContext.broadcast(bloom)
    ColumnBridge.column(BloomMightContainBcast(bcast,
      ColumnBridge.expression(xxhash64(c))))
  }
}

/** `mightContainLong` over a broadcast-shipped serialized BloomFilter
  * (see [[BloomGate.mightContain]]). Child must be an xxhash64 long.
  */
case class BloomMightContainBcast(bcast: Broadcast[Array[Byte]],
                                  child: Expression)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an xxhash64 LONG child, got ${child.dataType}")
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain_bcast"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bcast.value))

  def mightContain(h: Long): Boolean = filter.mightContainLong(h)

  override protected def nullSafeEval(h: Any): Any =
    mightContain(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomGate", this,
      classOf[BloomMightContainBcast].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.mightContain($h);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainBcast =
    copy(child = c)
}
