package graft

import org.apache.spark.sql.functions._
import graft.text.{Bpe, BpeMerges}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("fit learns the expected merges on a toy corpus, deterministically") {
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower widest widest widest"),
      (3L, "newest newest newest newest newest newest"))
      .toDF("doc_id", "text")
    val m1 = Bpe.fit(docs, "doc_id", "text", 4)
    val m2 = Bpe.fit(docs, "doc_id", "text", 4)
    assert(m1.merges === m2.merges) // deterministic
    // classic sennrich example: "es" (9: newest 6 + widest 3) wins first,
    // then "est" (9), then "lo" (7: low 5 + lower 2)
    assert(m1.merges.take(3) === Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("well-formedness is required and holds for the pretrained table") {
    assert(Bpe.Model(BpeMerges.pretrained).merges.nonEmpty)
    intercept[IllegalArgumentException] {
      // (ab, c) before (a, b): compound ranked ahead of its constituent
      Bpe.Model(Seq(("ab", "c"), ("a", "b")))
    }
  }

  test("kernel encode matches the fold-of-replaces Column form bitwise on the corpus") {
    val docs = Tables.documents(spark, sf)
    val model = Bpe.Model(BpeMerges.pretrained)
    val kernel = Bpe.encodeKernel(docs, "doc_id", "text", model)
    val composed = docs.select(col("doc_id"),
      Bpe.reprColumn(col("text"), model).as("r"),
      Bpe.tokenCount(Bpe.reprColumn(col("text"), model)).as("n"))
    val joined = kernel.join(composed, "doc_id")
    assert(joined.filter(col("bpe_repr") =!= col("r")).count() === 0)
    assert(joined.filter(col("n_tok") =!= col("n")).count() === 0)
    assert(kernel.count() === docs.count())
    // merging must actually compress: fewer tokens than characters
    val agg = kernel.agg(sum("n_tok")).head().getLong(0)
    val chars = docs.agg(sum(length(regexp_replace(col("text"), " ", "")))).head().getLong(0)
    assert(agg < chars)
  }

  test("encode handles delimiter chars, back-to-back merges, and edge whitespace") {
    val model = Bpe.Model(Seq(("a", "a"), ("l", "o")))
    val docs = Seq(
      (1L, "aaa"), (2L, "aaaa"), (3L, "lo(lo"), (4L, " a  b "), (5L, ""),
      (6L, "lolo"))
      .toDF("doc_id", "text")
    val got = Bpe.encodeKernel(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // leftmost-nonoverlapping: aaa -> [aa, a]
    assert(got(1L) === (("(aa)(a)", 2L)))
    // back-to-back occurrences both merge: aaaa -> [aa, aa]
    assert(got(2L) === (("(aa)(aa)", 2L)))
    // delimiter chars stripped before encoding: "lo(lo" -> "lolo"
    assert(got(3L) === (("(lo)(lo)", 2L)))
    assert(got(6L) === (("(lo)(lo)", 2L)))
    // empty split cells contribute nothing; spaces preserved
    assert(got(4L) === ((" (a)  (b) ", 2L)))
    assert(got(5L) === (("", 0L)))
    // the Column form agrees on exactly these edges
    val comp = docs.select(col("doc_id"),
      Bpe.reprColumn(col("text"), model).as("r"),
      Bpe.tokenCount(Bpe.reprColumn(col("text"), model)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(comp === got)
  }

  test("encode plans as a pure scan-stage map: no shuffle exchange") {
    val docs = Tables.documents(spark, sf)
    val plan = Bpe.encodeKernel(docs, "doc_id", "text",
      Bpe.Model(BpeMerges.pretrained)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
