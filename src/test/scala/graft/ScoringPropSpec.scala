package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.text.{BigramLm, QualityModel}

/** Property tests for the round-16 scoring models: bound invariants
  * over random word-like corpora (fixed seeds, deterministic).
  */
class ScoringPropSpec extends SparkSpec {
  import spark.implicits._

  private val textGen: Gen[Seq[String]] = for {
    nDocs <- Gen.choose(3, 12)
    docs <- Gen.listOfN(nDocs, for {
      nWords <- Gen.choose(0, 30)
      words <- Gen.listOfN(nWords,
        Gen.choose(1, 8).flatMap(l =>
          Gen.listOfN(l, Gen.alphaLowerChar).map(_.mkString)))
    } yield words.mkString(" "))
  } yield docs

  private def cases(n: Int, seed0: Long)(f: Seq[String] => Unit): Unit = {
    var seed = Seed(seed0)
    (1 to n).foreach { _ =>
      val (docs, next) = textGen.apply(Gen.Parameters.default, seed)
        .map(p => (p, seed.next)).getOrElse(fail("gen"))
      seed = next
      f(docs)
    }
  }

  private lazy val tables = BigramLm.tables(Tables.documents(spark, sf), "text")

  test("BigramLm score is a mean of interpolated probabilities: in [0, 1)") {
    val (pu, pb) = tables
    cases(5, 20260814L) { docs =>
      val scores = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(BigramLm.score(col("text"), pu, pb))
        .collect().map(_.getDouble(0))
      // each position contributes 0.7·p_bi + 0.3·p_uni, both in (0,1);
      // empty / 1-token docs score exactly 0
      scores.foreach(s => assert(s >= 0.0 && s < 1.0, s"score $s"))
    }
  }

  test("QualityModel margin bounded by bias ± max|weight|, keep = sign") {
    val bound = QualityModel.Weights.map(math.abs).max
    cases(5, 20260815L) { docs =>
      val rows = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(QualityModel.margin(col("text")),
          QualityModel.keep(col("text")))
        .collect()
      rows.foreach { r =>
        val m = r.getDouble(0)
        assert(m >= QualityModel.Bias - bound - 1e-12 &&
          m <= QualityModel.Bias + bound + 1e-12, s"margin $m")
        assert(r.getBoolean(1) == (m > 0.0))
      }
    }
  }
}
