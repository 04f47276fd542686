package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance verification of near-duplicate CANDIDATES — the
  * second stage of a production fuzzy-dedup pipeline: a cheap
  * set-similarity recall stage (LSH) proposes pairs, and the exact
  * character-level Levenshtein distance confirms them. Character edits
  * catch what token-set Jaccard cannot (reorderings of the same token
  * multiset look identical to a bag-of-shingles; a 3-char typo and a
  * 30-char rewrite can carry the same Jaccard).
  *
  * Scale shape: Levenshtein is O(len²) per pair, so it must NEVER run
  * all-pairs — here it runs ONLY on the LSH-recalled candidate set
  * (bounded by the banding + bucket caps of [[MinHash]]), after a
  * point-lookup join fetches the two texts per pair (|pairs| rows
  * moved, not the corpus). At 100 TB: same plan, with the candidate
  * set still the bounded side.
  *
  * The reference has no fuzzy-dedup surface (beyond-parity pipeline
  * tooling, same family as MinHash/SimHash/PPJoin).
  */
object EditVerify {

  /** LSH near-dup pairs with exact edit-distance confirmation:
    * (id1, id2, jaccard, edit) for candidates with Jaccard ≥
    * `threshold` AND levenshtein(text1, text2) ≤ `maxEdit`.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, threshold: Double = 0.5,
                     maxEdit: Int = 5): DataFrame = {
    val pairs = MinHash.nearDuplicates(docs, idCol, textCol, n, threshold)
    val t1 = docs.select(col(idCol).as("id1"), col(textCol).as("__t1"))
    val t2 = docs.select(col(idCol).as("id2"), col(textCol).as("__t2"))
    pairs.join(t1, "id1").join(t2, "id2")
      .withColumn("edit", levenshtein(col("__t1"), col("__t2")).cast("long"))
      .filter(col("edit") <= maxEdit)
      .select(col("id1"), col("id2"),
        graft.functions.Num.rnd(col("jaccard"), 6).as("jaccard"), col("edit"))
  }
}
