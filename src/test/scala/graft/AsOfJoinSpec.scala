package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    ("a", 10L, "e1"), ("a", 25L, "e2"), ("a", 5L, "e0"),
    ("b", 30L, "e3")).toDF("key", "t", "ev")
  private lazy val right = Seq(
    ("a", 10L, 100L), ("a", 20L, 200L),
    ("b", 40L, 400L)).toDF("key", "rt", "payload")

  test("backward asof picks most recent right row at or before left time") {
    val got = AsOfJoin.backward(left, right, "key", "t", "rt", Seq("payload"))
      .select("ev", "payload").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got("e1") === 100L) // t=10 matches rt=10 (inclusive)
    assert(got("e2") === 200L) // t=25 → latest rt<=25 is 20
    assert(got("e0") === null) // t=5 precedes all right rows → null
    assert(got("e3") === null) // b: t=30 precedes rt=40 → null
  }

  test("forward asof picks earliest right row at or after left time") {
    val got = AsOfJoin.forward(left, right, "key", "t", "rt", Seq("payload"))
      .select("ev", "payload").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got("e0") === 100L) // t=5 → earliest rt>=5 is 10
    assert(got("e1") === 100L) // inclusive at t=10
    assert(got("e2") === null) // t=25 has no later right row for 'a'... rt=20<25 → null
    assert(got("e3") === 400L) // b: t=30 → rt=40
  }

  test("sub-second timestamp ordering is preserved (no whole-second truncation)") {
    // right row at 10.5s is AFTER the left event at 10.2s; a cast-to-long
    // ordering key would truncate both to 10 and wrongly match it.
    val l = Seq(("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:10.200"), "e"))
      .toDF("key", "t", "ev")
    val r = Seq(
      ("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:09.900"), 1L),
      ("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:10.500"), 2L))
      .toDF("key", "rt", "p")
    val back = AsOfJoin.backward(l, r, "key", "t", "rt", Seq("p")).head()
    assert(back.getAs[Long]("p") === 1L) // most recent <= 10.2s is 9.9s
    val fwd = AsOfJoin.forward(l, r, "key", "t", "rt", Seq("p")).head()
    assert(fwd.getAs[Long]("p") === 2L) // earliest >= 10.2s is 10.5s
  }

  test("tolerance nulls matches farther back than the bound") {
    val l = Seq(("k", 100L, "e1"), ("k", 200L, "e2")).toDF("key", "t", "ev")
    val r = Seq(("k", 95L, 1L), ("k", 120L, 2L)).toDF("key", "rt", "p")
    val got = AsOfJoin.backward(l, r, "key", "t", "rt", Seq("p"),
        tolerance = Some(10L))
      .collect().map(row => row.getAs[String]("ev") ->
        (if (row.isNullAt(row.fieldIndex("p"))) null else row.getAs[Long]("p"))).toMap
    assert(got("e1") === 1L)   // t=100, match rt=95 → distance 5 <= 10
    assert(got("e2") === null) // t=200, nearest rt=120 → distance 80 > 10
    val fwd = AsOfJoin.forward(l, r, "key", "t", "rt", Seq("p"),
        tolerance = Some(25L))
      .collect().map(row => row.getAs[String]("ev") ->
        (if (row.isNullAt(row.fieldIndex("p"))) null else row.getAs[Long]("p"))).toMap
    assert(fwd("e1") === 2L)   // t=100 → rt=120, distance 20 <= 25
    assert(fwd("e2") === null) // no rt >= 200
  }

  test("ties at identical timestamps take the right row (inclusive <=)") {
    val l = Seq(("k", 10L, "x")).toDF("key", "t", "ev")
    val r = Seq(("k", 10L, 1L)).toDF("key", "rt", "p")
    val got = AsOfJoin.backward(l, r, "key", "t", "rt", Seq("p")).head()
    assert(got.getAs[Long]("p") === 1L)
  }

  test("allow_exact_matches=false excludes equal-time right rows in every direction") {
    val l = Seq(("k", 10L, "x")).toDF("key", "t", "ev")
    val r = Seq(("k", 10L, 1L), ("k", 5L, 2L), ("k", 15L, 3L)).toDF("key", "rt", "p")
    def p(df: org.apache.spark.sql.DataFrame): Any = {
      val row = df.head(); if (row.isNullAt(row.fieldIndex("p"))) null else row.getAs[Long]("p")
    }
    // inclusive: the rt=10 row wins backward and forward, and is the
    // distance-0 nearest
    assert(p(AsOfJoin.backward(l, r, "key", "t", "rt", Seq("p"))) === 1L)
    assert(p(AsOfJoin.forward(l, r, "key", "t", "rt", Seq("p"))) === 1L)
    assert(p(AsOfJoin.nearest(l, r, "key", "t", "rt", Seq("p"))) === 1L)
    // strict: it is skipped; backward falls to rt=5, forward to rt=15,
    // nearest ties |10-5| = |15-10| → backward
    assert(p(AsOfJoin.backward(l, r, "key", "t", "rt", Seq("p"),
      allowExactMatches = false)) === 2L)
    assert(p(AsOfJoin.forward(l, r, "key", "t", "rt", Seq("p"),
      allowExactMatches = false)) === 3L)
    assert(p(AsOfJoin.nearest(l, r, "key", "t", "rt", Seq("p"),
      allowExactMatches = false)) === 2L)
  }

  test("nearest picks the smallest |Δt|, resolves ties backward, honors tolerance") {
    val l = Seq(
      ("k", 100L, "mid"),    // rt=90 (d=10) vs rt=130 (d=30) → backward 1
      ("k", 125L, "fwd"),    // rt=90 (d=35) vs rt=130 (d=5)  → forward 2
      ("k", 110L, "tie"),    // rt=90 (d=20) vs rt=130 (d=20) → tie → backward 1
      ("k", 500L, "far"),    // nearest is rt=130 (d=370) → beyond tolerance
      ("z", 10L, "none"))    // no right rows for key z
      .toDF("key", "t", "ev")
    val r = Seq(("k", 90L, 1L), ("k", 130L, 2L)).toDF("key", "rt", "p")
    val got = AsOfJoin.nearest(l, r, "key", "t", "rt", Seq("p"),
        tolerance = Some(100L))
      .collect().map(row => row.getAs[String]("ev") ->
        (if (row.isNullAt(row.fieldIndex("p"))) null else row.getAs[Long]("p"))).toMap
    assert(got("mid") === 1L)
    assert(got("fwd") === 2L)
    assert(got("tie") === 1L)
    assert(got("far") === null)
    assert(got("none") === null)
  }

  test("nearest equals a brute-force scan over a random-ish frame") {
    val l = (0 until 200).map(i => ("k" + i % 5, (i * 37 % 101).toLong, i.toLong))
      .toDF("key", "t", "ev")
    val r = (0 until 80).map(i => ("k" + i % 5, (i * 53 % 97).toLong, i.toLong * 10))
      .toDF("key", "rt", "p")
    val got = AsOfJoin.nearest(l, r, "key", "t", "rt", Seq("p"))
      .collect().map(row => row.getAs[Long]("ev") ->
        (if (row.isNullAt(row.fieldIndex("p"))) null else row.getAs[Long]("p"))).toMap
    val rightRows = r.collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    l.collect().foreach { row =>
      val (key, t, ev) = (row.getString(0), row.getLong(1), row.getLong(2))
      val cands = rightRows.filter(_._1 == key)
      val want =
        if (cands.isEmpty) null
        else {
          // min |Δt|; ties → smaller rt (backward); equal rt collapses to
          // the window's last-carried value, so dedup rt first like the
          // engine's callers do
          val best = cands.groupBy(_._2).map { case (rt, g) => (rt, g.map(_._3).max) }
            .toSeq.minBy { case (rt, _) => (math.abs(rt - t), rt) }
          best._2
        }
      // duplicate (key, rt) pairs exist in this frame; the engine carries
      // the LAST right row within equal (t, tag) which is
      // order-nondeterministic — only assert on keys with unique rt
      val unique = cands.groupBy(_._2).forall(_._2.size == 1)
      if (unique) assert(got(ev) === want, s"ev=$ev key=$key t=$t")
    }
  }
}
