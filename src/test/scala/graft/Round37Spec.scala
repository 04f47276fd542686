package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.text.CdcChunkSet

/** Round-12 wave 5: content-defined chunking (q415/q416) and the
  * overlapping-chunk stream twin (q413).
  */
class Round37Spec extends SparkSpec {

  private def cdcChunks(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), explode(ColumnBridge.column(
      CdcChunkSet(ColumnBridge.expression(col("text")), 8))).as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"), col("c.chunk").as("chunk"))

  test("CdcChunkSet ≡ composed window formulation") {
    val docs = Tables.documents(spark, sf).limit(100)
    val a = cdcChunks(docs)
    val tk = docs.select(col("doc_id"),
      posexplode(graft.text.TextStats.tokensNonEmpty(col("text"))).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val b = tk
      .withColumn("f", when(
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % 8 === 0, 1)
        .otherwise(0))
      .withColumn("idx", sum(col("f")).over(w).cast("int"))
      .groupBy("doc_id", "idx")
      .agg(array_join(transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
        x => x("tok")), " ").as("chunk"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("CDC chunks are edit-robust: chunks after the first boundary survive a prepend") {
    import spark.implicits._
    val doc = Tables.documents(spark, sf)
      .filter(col("doc_id") === 7).select("text").head().getString(0)
    val orig = Seq((1L, doc)).toDF("doc_id", "text")
    val edited = Seq((1L, "inserted_token_zq " + doc)).toDF("doc_id", "text")
    val o = cdcChunks(orig).collect().map(r => (r.getInt(1), r.getString(2)))
    val e = cdcChunks(edited).collect().map(r => r.getString(2)).toSet
    assert(o.length >= 2, "need a doc with ≥2 chunks for the property")
    // every original chunk from the first boundary onward reappears
    o.filter(_._1 >= 1).foreach { case (_, chunk) =>
      assert(e.contains(chunk), s"post-boundary chunk lost: $chunk")
    }
  }

  test("CDC dedup: identical docs share every chunk hash") {
    import spark.implicits._
    val doc = Tables.documents(spark, sf)
      .filter(col("doc_id") === 11).select("text").head().getString(0)
    val two = Seq((1L, doc), (2L, doc)).toDF("doc_id", "text")
    val per = cdcChunks(two).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getInt(1), r.getString(2))).sortBy(_._1).toSeq
      }
    assert(per(1L).nonEmpty && per(1L) == per(2L))
  }

  test("q416 mass accounting: dup_tokens = (n_occ-1)·n_toks per chunk") {
    val out = SparkEntry.queries("q416_cdc_dedup")(spark, sf).collect()
    // the synthetic corpus repeats text heavily at small SF → non-empty
    out.foreach { r =>
      assert(r.getLong(1) >= 2 && r.getLong(2) >= 1)
      assert(r.getLong(1) >= r.getLong(2)) // occurrences ≥ distinct docs
    }
  }
}
