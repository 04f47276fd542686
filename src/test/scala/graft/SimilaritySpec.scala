package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vector is 1, orthogonal is 0") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("same"),
      Similarity.cosine(col("a"), col("c")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("native DotProduct matches the composed zip_with/aggregate form bit-for-bit") {
    val e = Tables.embeddings(spark, sf).limit(500)
    val pairs = e.select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("j"), col("embedding").as("b")))
      .filter(col("i") < col("j")).limit(2000)
    val diff = pairs.select(
      Similarity.dot(col("a"), col("b")).as("nat"),
      Similarity.dotComposed(col("a"), col("b")).as("comp"))
      .filter(not(col("nat") === col("comp"))) // bitwise: no tolerance
    assert(diff.count() === 0)
    // null and length-mismatch contracts
    val edge = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      (Seq(1.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val got = edge.select(Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.dotComposed(col("a"), col("b")).as("c")).collect()
    assert(got(0).getDouble(0) === 11.0 && got(0).getDouble(1) === 11.0)
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
  }

  test("brute-force top-k returns k nearest, ranked") {
    val e = Tables.embeddings(spark, sf)
    val topk = Similarity.bruteForceTopK(e.filter(col("vec_id") === 0), e, 3).collect()
    assert(topk.length === 3)
    assert(topk.map(_.getLong(3)).toSeq === Seq(1L, 2L, 3L))
    val sims = topk.map(_.getDouble(2))
    assert(sims.sliding(2).forall(p => p(0) >= p(1)))
    // verify against a driver-side exact computation
    val vecs = e.filter(col("vec_id") <= 200).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = vecs(0L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val best = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => id -> cos(q, v) }.maxBy(_._2)
    // top-1 from the engine must at least match the best among first 200
    assert(topk.head.getDouble(2) >= best._2 - 1e-6)
  }

  test("LSH buckets vectors deterministically and finds same-bucket hits") {
    val planes = Similarity.planeLiterals(6, 64)
    val e = Tables.embeddings(spark, sf)
    val b1 = e.select(Similarity.signBits(col("embedding"), planes).as("b"))
      .agg(sum(col("b"))).head().getLong(0)
    val b2 = e.select(Similarity.signBits(col("embedding"), planes).as("b"))
      .agg(sum(col("b"))).head().getLong(0)
    assert(b1 === b2) // deterministic
    val hits = Similarity.lshTopK(e.filter(col("vec_id") < 16), e, 3, planes)
    assert(hits.count() > 0)
  }

  test("tiled all-pairs cosine equals brute force bitwise and never cross-joins") {
    val e = Tables.embeddings(spark, sf)
    val brute = Similarity.cosinePairs(e, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val tiled = Similarity.cosinePairsTiled(e, 0.4)
    val got = tiled.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
    // the whole point of the tiling: a bounded-key hash join, not a
    // corpus-on-every-task nested loop
    val physical = tiled.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"))
    assert(!physical.contains("BroadcastNestedLoopJoin"))
  }

  test("semDedup matches a driver-side naive computation and keeps one rep per neighborhood") {
    import graft.similarity.{IVF, IVFCentroids}
    val e = Tables.embeddings(spark, sf)
    val model = IVF.Model(IVFCentroids.pretrained)
    val got = Similarity.semDedup(e, model, 0.4).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap

    // naive reference: same cell assignment + min-id dominance
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val cents = IVFCentroids.pretrained
    def cellOf(v: Array[Double]): Int =
      cents.indices.minBy { j =>
        val c = cents(j)
        val d2 = v.map(x => x * x).sum - 2.0 * v.zip(c).map { case (x, y) => x * y }.sum +
          c.map(x => x * x).sum
        (d2, j)
      }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val byCell = vecs.groupBy { case (_, v) => cellOf(v) }
    val expect = byCell.toSeq.flatMap { case (cell, members) =>
      members.toSeq.map { case (id, v) =>
        val dominated = members.exists { case (oid, ov) =>
          oid < id && rnd6(cos(v, ov)) >= 0.4
        }
        id -> ((cell, !dominated))
      }
    }.toMap
    assert(got.size === expect.size)
    // cells must agree exactly; kept flags may differ only where the
    // rounded similarity sits exactly on the threshold boundary AND
    // double summation order differs — require full agreement here
    // (the oracle gate at sf0.01 enforces the same).
    expect.foreach { case (id, (cell, kept)) =>
      assert(got(id)._1 === cell, s"cell mismatch for $id")
      assert(got(id)._2 === kept, s"kept mismatch for $id")
    }
    // at least one duplicate must actually be dropped for the test to bite
    assert(got.values.exists(!_._2))
    assert(got.values.exists(_._2))
    // scale shape: equi-join on cell, never a nested loop
    val plan = Similarity.semDedup(e, model, 0.4).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
