package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.text.Bpe

/** Property tests for the BPE trainer + encoder over random corpora:
  * losslessness (token concatenation restores the word), vocabulary
  * closure (every emitted multi-char token is a product of the learned
  * merge table), and kernel ≡ composed-Column agreement on arbitrary
  * inputs — all with fixed seeds (deterministic).
  */
class BpePropSpec extends SparkSpec {
  import spark.implicits._

  private val corpusGen: Gen[Seq[String]] = for {
    nDocs <- Gen.choose(3, 12)
    docs <- Gen.listOfN(nDocs, for {
      nWords <- Gen.choose(0, 25)
      words <- Gen.listOfN(nWords,
        Gen.choose(1, 9).flatMap(l =>
          Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    } yield words.mkString(" "))
  } yield docs

  test("random corpora: lossless encode, vocab closure, kernel == composed") {
    var seed = Seed(20260813L)
    (1 to 6).foreach { caseNo =>
      val (docs, nextSeed) = corpusGen.apply(Gen.Parameters.default, seed)
        .map(p => (p, seed.next)).getOrElse(fail("gen"))
      seed = nextSeed
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val model = Bpe.fit(df, "doc_id", "text", numMerges = 12, sampleDocs = 100)
      val products = model.merges.map { case (x, y) => x + y }.toSet
      val enc = Bpe.encodeKernel(df, "doc_id", "text", model)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      docs.zipWithIndex.foreach { case (text, i) =>
        val (repr, nTok) = enc(i.toLong)
        // lossless: stripping delimiters restores the original text
        assert(repr.replace("(", "").replace(")", "") === text,
          s"case $caseNo doc $i lossless")
        // every multi-char token is a merge product; count matches
        val toks = repr.split("[)( ]+").filter(_.nonEmpty)
        assert(toks.length.toLong === nTok, s"case $caseNo doc $i count")
        toks.filter(_.length > 1).foreach { t =>
          assert(products.contains(t), s"case $caseNo doc $i token $t")
        }
      }
      // kernel ≡ composed Column fold on this corpus
      val comp = df.select(org.apache.spark.sql.functions.col("doc_id"),
        Bpe.reprColumn(org.apache.spark.sql.functions.col("text"), model).as("r"),
        Bpe.tokenCount(Bpe.reprColumn(
          org.apache.spark.sql.functions.col("text"), model)).as("n"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(comp === enc, s"case $caseNo kernel/composed divergence")
    }
  }
}
