package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.text.PhraseHits

/** Round-12 wave 10: duplicated-span report, blocklist phrase matcher,
  * epoch shuffle + source interleave (q424-q428).
  */
class Round41Spec extends SparkSpec {

  private val L = 8

  private def toks(t: String): Array[String] = t.split(' ').filter(_.nonEmpty)

  test("q424 duplicated spans ≡ in-JVM brute-force interval union") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val grams = docs.flatMap { case (id, t) =>
      val tk = toks(t)
      (0 to tk.length - L).map(p => (id, p + 1, tk.slice(p, p + L).mkString(" ")))
    }
    val cnt = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val expected = grams.filter(g => cnt(g._3) >= 2).groupBy(_._1).map {
      case (id, gs) =>
        val ps = gs.map(_._2).sorted
        // islands: break when the gap exceeds the gram width
        var spans = List.empty[(Int, Int)] // (start, end) token interval
        ps.foreach { p =>
          spans match {
            case (s0, e0) :: rest if p <= e0 + 1 =>
              spans = (s0, math.max(e0, p + L - 1)) :: rest
            case _ => spans = (p, p + L - 1) :: spans
          }
        }
        id -> (spans.size.toLong, spans.map { case (s0, e0) => (e0 - s0 + 1).toLong }.sum)
    }
    val got = SparkEntry.queries("q424_dup_span_report")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
    // spans never exceed the document
    val nt = docs.map { case (id, t) => id -> toks(t).length.toLong }.toMap
    got.foreach { case (id, (_, dupToks)) => assert(dupToks <= nt(id)) }
  }

  test("q425 per-source mass conserves q424 and the corpus totals") {
    val perDoc = SparkEntry.queries("q424_dup_span_report")(spark, sf).collect()
    val bySrc = SparkEntry.queries("q425_dup_span_by_source")(spark, sf).collect()
    assert(bySrc.map(_.getLong(4)).sum == perDoc.map(_.getLong(2)).sum) // dup_tokens
    assert(bySrc.map(_.getLong(3)).sum == perDoc.length.toLong)         // docs_with_dups
    val nDocs = Tables.documents(spark, sf).count()
    assert(bySrc.map(_.getLong(1)).sum == nDocs)
  }

  test("PhraseHits: token-aligned, overlapping, multi-length — brute replay") {
    import spark.implicits._
    val phrases = Seq("a a", "b c d", "cat")
    val rows = Seq(
      "a a a b c d",    // "a a" twice (overlap), "b c d" once
      "catboost cat x", // token-aligned: only the bare "cat" counts
      "b c",            // incomplete phrase: no hit
      "")
    val got = rows.toDF("text")
      .select(ColumnBridge.column(PhraseHits(
        ColumnBridge.expression(col("text")), phrases)).as("h"))
      .collect().map(_.getSeq[Int](0))
    assert(got(0) == Seq(2, 1, 0))
    assert(got(1) == Seq(0, 0, 1))
    assert(got(2) == Seq(0, 0, 0))
    assert(got(3) == Seq(0, 0, 0))
    // differential vs a sliding-window count on the corpus
    val lex = Seq("batch batch", "slow query", "key order sort")
    val docs = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val brute = lex.map { p =>
      val pt = p.split(' ')
      docs.map { t =>
        val tk = toks(t)
        (0 to tk.length - pt.length)
          .count(i => tk.slice(i, i + pt.length).sameElements(pt)).toLong
      }.sum
    }
    val eng = docs.toSeq.toDF("text")
      .select(posexplode(ColumnBridge.column(PhraseHits(
        ColumnBridge.expression(col("text")), lex))).as(Seq("pi", "c")))
      .groupBy("pi").agg(sum("c").as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    lex.indices.foreach(i => assert(eng.getOrElse(i, 0L) == brute(i), lex(i)))
  }

  test("q427 epoch shuffle: per-epoch permutation matching the key sort") {
    val out = SparkEntry.queries("q427_epoch_shuffle")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.documents(spark, sf).count()
    (0L to 2L).foreach { e =>
      val ep = out.filter(_._1 == e)
      assert(ep.map(_._3).sorted.toSeq == (1L to n).toSeq, s"epoch $e not a permutation")
      // rank order ≡ md5 key order
      val md = java.security.MessageDigest.getInstance("MD5")
      def key(id: Long): String = {
        md.reset()
        md.digest(s"$id:$e".getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      val byKey = ep.map(t => (key(t._2), t._3)).sortBy(_._1).map(_._2)
      assert(byKey.toSeq == (1L to n).toSeq, s"epoch $e rank != key order")
    }
    // different epochs genuinely permute differently
    val r0 = out.filter(_._1 == 0L).sortBy(_._3).map(_._2).toSeq
    val r1 = out.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq
    assert(r0 != r1)
  }

  test("q428 interleave: global permutation that round-robins sources") {
    val out = SparkEntry.queries("q428_source_interleave")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val n = out.length
    assert(out.map(_._4).sorted.toSeq == (1L to n).toSeq, "pos not a permutation")
    // pos order ≡ lexicographic (rn, source) order
    val sorted = out.sortBy(t => (t._3, t._2))
    sorted.zipWithIndex.foreach { case (t, i) =>
      assert(t._4 == i + 1, s"doc ${t._1}: pos ${t._4} != ${i + 1}")
    }
    // within one round the sources are strictly increasing ⇒ round-robin
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 < b._3 || (a._3 == b._3 && a._2 < b._2))
      case _ =>
    }
  }
}
