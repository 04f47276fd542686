package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.{GraftSession, Tables}
import graft.text.PhraseHits

/** PhraseHits A/B at the staged sf10 documents: ONE native lexicon
  * pass vs the composed per-phrase split-count chain
  * (size(split(' '||text||' ', ' '||p||' ')) - 1 per phrase — P
  * separate codegen'd passes over the padded text, the best
  * builtin-only spelling). Parity asserted on totals.
  */
object ProbeQ426 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/target/tmp/sf100x")
    val spark = GraftSession.builder(master = "local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val phrases = Seq("batch batch", "slow query", "join data",
      "window window", "key order sort")

    def native(): DataFrame = Tables.documents(spark, d)
      .select(posexplode(ColumnBridge.column(PhraseHits(
        ColumnBridge.expression(col("text")), phrases))).as(Seq("pi", "c")))
      .groupBy("pi").agg(sum("c").as("n"))

    // value-identical composed twin (overlap-correct, unlike a
    // split()-count): explode all 2-grams and 3-grams, filter to the
    // lexicon, hash-agg — the Generate-stage economy PhraseHits skips
    def composed(): DataFrame = {
      val docs = Tables.documents(spark, d)
      def grams(n: Int) = docs.select(explode(ColumnBridge.column(
        graft.text.NgramList(ColumnBridge.expression(col("text")), n))).as("g"))
      grams(2).unionByName(grams(3))
        .filter(col("g").isin(phrases: _*))
        .groupBy("g").agg(count(lit(1)).as("n"))
    }

    def time(tag: String, f: () => DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("native_phrasehits", native)
    time("composed_ngram_explode", composed)
    val a = native().collect().map(r => phrases(r.getInt(0)) -> r.getLong(1)).toMap
    val b = composed().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val parity = phrases.forall(p => a.getOrElse(p, 0L) == b.getOrElse(p, 0L))
    println(s"parity: $parity")
    spark.stop()
  }
}
