package graft

import org.apache.spark.sql.functions._

import graft.functions.NfcNormalize

/** Round-12 wave 6: NFC normalization, source datasheet (q417/q418). */
class Round38Spec extends SparkSpec {

  test("NfcNormalize: composed ≡ decomposed after NFC; ASCII untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "caf" + "e" + "́"), // decomposed
      (2L, "café"),            // precomposed
      (3L, "plain ascii"),
      (4L, "")).toDF("id", "t")
    val out = df.select(col("id"), NfcNormalize(col("t")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == out(2L) && out(1L) == "café")
    assert(out(3L) == "plain ascii" && out(4L) == "")
    // idempotent
    val twice = df.select(NfcNormalize(NfcNormalize(col("t"))).as("n"),
      NfcNormalize(col("t")).as("m")).collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("q417: the two injected families hash identically after NFC") {
    val rows = SparkEntry.queries("q417_nfc_normalize")(spark, sf).collect()
    val byMod = rows.groupBy(_.getLong(0) % 3)
    // decomposed rows (mod 0) are NOT pre-normalized; precomposed (mod 1) are
    byMod(0L).foreach(r => assert(!r.getBoolean(3)))
    byMod(1L).foreach(r => assert(r.getBoolean(3)))
    byMod(2L).foreach(r => assert(r.getBoolean(3)))
    // decomposed loses exactly one char (e + combining → é)
    byMod(0L).foreach(r => assert(r.getInt(1) - r.getInt(2) == 1))
  }

  test("q418 datasheet: token mass and dup accounting reconcile") {
    val rows = SparkEntry.queries("q418_source_datasheet")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(3) >= 1)
      val q = r.getDouble(4)
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getLong(5) >= 0 && r.getLong(5) < r.getLong(1))
    }
  }
}
