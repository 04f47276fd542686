package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Exact all-pairs Jaccard near-duplicate detection via prefix filtering
  * (the AllPairs/PPJoin family) — the scalable EXACT path, complementing
  * the approximate MinHash-LSH path.
  *
  * Theorem (prefix filter): under any global total order of shingles, if
  * J(A,B) ≥ t then the first |A| - ⌈t·|A|⌉ + 1 shingles of A and the
  * first |B| - ⌈t·|B|⌉ + 1 of B share at least one element. Ordering
  * shingles by ascending document frequency puts the RAREST shingles in
  * the prefix, so prefix-index buckets are small and candidate pairs are
  * near-linear in the true match count — versus the full inverted index,
  * whose pair expansion is quadratic in every bucket (boilerplate
  * shingles explode). Candidates are then verified with the exact
  * intersection, so results are identical to the naive algorithm.
  *
  * Scale: two shuffles over the (shingle, doc) index (df-count join +
  * prefix bucket), one candidate shuffle, one verify join against the
  * shingle sets. Every stage is bounded by data statistics, none by the
  * corpus squared.
  *
  * WHEN TO USE: high thresholds (t ≥ ~0.8), where the prefix is a small
  * fraction of each set and candidates collapse to near the true match
  * count. At t = 0.5 the prefix is half of every set — candidates barely
  * shrink while the verify join must ship the shingle sets themselves —
  * and the inverted-index pair-COUNTING form (q54: shuffles only packed
  * longs) wins. Measured at sf0.1: counting 2.1s, prefix 10s at t=0.5;
  * the ratio inverts as t → 1.
  */
object ExactNearDup {

  /** (id1, id2, jaccard) for all pairs with exact Jaccard ≥ threshold.
    * ids must fit in 32 bits (packed-pair shuffle key, like MinHash).
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // The emitted jaccard is rounded to 6 digits and filtered at
    // >= threshold (mirroring the SQL-oracle semantics), so the prefix
    // filter runs at a slightly lower bound: a pair whose true J is
    // 0.4999996 rounds UP to the threshold and must still be a candidate.
    val tEff = threshold - 1e-6
    val sh = docs.select(col(idCol), Shingles.shingles(col(textCol), n).as("sh"))
      .cache()
    // |A| comes straight off the shingle array — no count window over
    // the exploded index (one full WindowExec pass saved).
    val inv = sh.select(col(idCol), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
    // global canonical order: (document frequency asc, shingle asc).
    val dfreq = inv.groupBy("s").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(idCol)
    val ranked = inv.join(dfreq, "s")
      .withColumn("rk", row_number().over(byDoc.orderBy(col("df"), col("s"))))
    // prefix length |A| - ceil(t*|A|) + 1
    val prefix = ranked.filter(
      col("rk") <= col("n") - ceil(lit(tEff) * col("n")) + 1)
    // candidate pairs: docs sharing a prefix shingle AND passing the
    // PPJoin positional filter (see PrefixPairs) — without it every
    // bucket expands quadratically regardless of length/position
    // compatibility, and the candidate set grows faster than the
    // corpus (measured 7.1× per 10× data before, ~linear after).
    val lists = prefix.groupBy("s")
      .agg(sort_array(collect_list(struct(
        col(idCol).cast("long").as("id"),
        col("n").cast("int").as("n"),
        col("rk").cast("int").as("rk")))).as("es"))
      .filter(size(col("es")) >= 2)
    val cand = lists
      .select(explode(ColumnBridge.column(
        PrefixPairs(ColumnBridge.expression(col("es")), tEff))).as("pk"))
      .distinct()
      .select(shiftrightunsigned(col("pk"), 32).as("id1"),
        col("pk").bitwiseAND(lit(0xffffffffL)).as("id2"))
    // exact verification of the candidates only
    val s1 = sh.select(col(idCol).as("id1"), col("sh").as("sh1"))
    val s2 = sh.select(col(idCol).as("id2"), col("sh").as("sh2"))
    cand.join(s1, "id1").join(s2, "id2")
      .withColumn("jaccard", graft.functions.Num.rnd(
        Shingles.jaccard(col("sh1"), col("sh2")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }
}
