package graft

import org.apache.spark.sql.functions._

/** Round-12 wave 4: hard-negative mining, PII redaction, boilerplate
  * strip (q410-q412).
  */
class Round36Spec extends SparkSpec {

  test("hard negatives: tiers partition the union of the two rank lists") {
    val rows = SparkEntry.queries("q410_hard_negatives")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tier, lex, sem) = (r.getString(1), r.getLong(2), r.getLong(3))
      tier match {
        case "positive"      => assert(lex > 0 && sem > 0)
        case "hard_negative" => assert(lex > 0 && sem == -1)
        case "semantic_only" => assert(lex == -1 && sem > 0)
        case other           => fail(s"unknown tier $other")
      }
    }
    // ids are unique (full-outer on key)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("PII redaction: injected rows scrubbed, untouched rows byte-identical") {
    val out = SparkEntry.queries("q411_pii_redact")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    val orig = Tables.documents(spark, sf).select(col("doc_id"), md5(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, (ne, ni, h)) =>
      if (id % 3 == 0) { assert(ne >= 1 && ni >= 1); assert(h != orig(id)) }
      else { assert(ne == 0 && ni == 0); assert(h == orig(id)) }
    }
  }

  test("boilerplate strip: discovered prefix covers the injected header") {
    val rows = SparkEntry.queries("q412_boilerplate_strip")(spark, sf).collect()
    rows.foreach { r =>
      val (source, plen) = (r.getString(0), r.getLong(1))
      val header = s"[$source] "
      assert(plen >= header.length, s"$source prefix_len $plen < ${header.length}")
    }
    // chars_after must equal Σ len(header+text) - n·cpl exactly
    val docs = Tables.documents(spark, sf)
      .select(col("source"), (length(col("text")) +
        length(col("source")) + lit(3)).as("l2"))
      .groupBy("source").agg(sum(col("l2")).as("tot"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (tot, n) = docs(r.getString(0))
      assert(r.getLong(3) == tot - n * r.getLong(1))
    }
  }
}
