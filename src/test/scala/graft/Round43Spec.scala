package graft

import org.apache.spark.sql.functions._

import graft.text.GramIndex

/** Round-12 wave 12: persisted gram-index append loop (q431/q432). */
class Round43Spec extends SparkSpec {

  private val L = 8

  test("gram-index merge ≡ from-scratch rebuild over corpus ∪ batch") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val merged = GramIndex.merge(
      GramIndex.build(corpus, "doc_id", "text", L), batch, "doc_id", "text", L)
    val rebuilt = GramIndex.build(docs, "doc_id", "text", L)
    assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty)
  }

  test("gram-index probe ≡ in-JVM batch-vs-corpus span replay") {
    def toks(t: String) = t.split(' ').filter(_.nonEmpty)
    val all = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val corpusGrams = all.filter(_._1 % 10 != 0).flatMap { case (_, t) =>
      val tk = toks(t)
      (0 to tk.length - L).map(p => tk.slice(p, p + L).mkString(" "))
    }.toSet
    val expected = all.filter(_._1 % 10 == 0).flatMap { case (id, t) =>
      val tk = toks(t)
      val ps = (0 to tk.length - L).filter(p =>
        corpusGrams(tk.slice(p, p + L).mkString(" "))).map(_ + 1)
      if (ps.isEmpty) None else {
        var spans = List.empty[(Int, Int)]
        ps.foreach { p =>
          spans match {
            case (s0, e0) :: rest if p <= e0 + 1 =>
              spans = (s0, math.max(e0, p + L - 1)) :: rest
            case _ => spans = (p, p + L - 1) :: spans
          }
        }
        Some(id -> (spans.size.toLong,
          spans.map { case (s0, e0) => (e0 - s0 + 1).toLong }.sum))
      }
    }.toMap
    val got = SparkEntry.queries("q431_gram_index_probe")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("retention repair ≡ rebuild from survivors; re-election exercised") {
    val docs = Tables.documents(spark, sf)
    val repaired = SparkEntry.queries("q434_retention_delete")(spark, sf)
    val rebuilt = graft.text.GramIndex
      .build(docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text", L)
    assert(repaired.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(repaired).isEmpty)
    // the fixture must actually exercise the stale-owner path: some
    // full-index gram is owned by a deleted doc but survives deletion
    val full = graft.text.GramIndex.build(docs, "doc_id", "text", L)
    val stale = full.filter(col("owner") % 7 === 0)
      .join(rebuilt.select("gram_md5"), Seq("gram_md5")).count()
    assert(stale > 0, "no stale-owner grams — re-election not exercised")
  }

  test("streaming gram probe ≡ batch q431 (closed-form fold ≡ islands window)") {
    val a = SparkEntry.queries("q433_stream_gram_probe")(spark, sf)
    val b = SparkEntry.queries("q431_gram_index_probe")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("DoReMi reweight: weights simplex + boost monotone in mean quality") {
    val rows = SparkEntry.queries("q435_doremi_reweight")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val wSum = rows.map(_._5).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum $wSum")
    rows.foreach { case (_, _, _, b, w) => assert(b > 0 && w >= 0 && w <= 1) }
    // boost strictly increases with mean quality (exp is monotone)
    val byQ = rows.sortBy(_._3)
    byQ.sliding(2).foreach {
      case Array(a, b2) =>
        assert(a._3 == b2._3 || a._4 <= b2._4, s"${a._1} vs ${b2._1}")
      case _ =>
    }
    // a source with above-corpus quality gains mass vs its token share
    val totToks = rows.map(_._2).sum.toDouble
    rows.filter(_._4 > 1.0).foreach { case (s0, t, _, _, w) =>
      assert(w >= t / totToks * 0.999, s"$s0 should gain mass")
    }
  }
}
