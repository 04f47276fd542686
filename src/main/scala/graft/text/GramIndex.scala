package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** PERSISTED positional-gram index — the exact-substring member of the
  * incremental-dedup index family (MinHash.bucketIndex near-dup,
  * Similarity.embedCellIndex semantic, ChunkIndex content chunks): a
  * curation loop summarizes the corpus's token L-grams once, then every
  * new batch pays one gram scan + one hash join to learn which of its
  * SPANS already exist in the corpus (the q424/q429 span machinery,
  * incrementally).
  *
  * Index schema: (gram_md5, owner bigint, n_occ bigint) — one row per
  * DISTINCT gram. Both columns are mergeable (min / sum), so [[merge]]
  * over an accepted batch is EXACTLY the index rebuilt from
  * corpus ∪ batch (no frozen-parameter caveat: gram boundaries depend
  * only on content) — q432 pins merge ≡ rebuild row-for-row.
  *
  * Cost contract: the index is ∝ distinct corpus grams (≈ corpus
  * tokens) — the price of EXACT substring coverage; the sampled
  * (winnowed) and chunk-level indexes are the cheaper tiers of the
  * same loop.
  */
object GramIndex {

  /** One row per (doc, gram position): (idCol, p, gram_md5), p 1-based. */
  def grams(docs: DataFrame, idCol: String, textCol: String, L: Int): DataFrame =
    docs.select(col(idCol), posexplode(ColumnBridge.column(NgramList(
        ColumnBridge.expression(col(textCol)), L))).as(Seq("p0", "g")))
      .select(col(idCol), (col("p0") + 1).as("p"), md5(col("g")).as("gram_md5"))

  /** Aggregate a corpus into the index (one row per distinct gram) —
    * exchange rows ∝ distinct grams, partial aggs map-side.
    */
  def build(docs: DataFrame, idCol: String, textCol: String, L: Int): DataFrame =
    grams(docs, idCol, textCol, L)
      .groupBy("gram_md5")
      .agg(min(col(idCol)).as("owner"), count(lit(1)).as("n_occ"))

  /** Probe a new batch against a persisted index: per batch document,
    * the maximal spans already present in the indexed corpus (ANY
    * indexed occurrence makes an incoming gram a duplicate — the
    * incremental analogue of q424's ≥2 corpus-wide rule). One gram
    * scan of the BATCH + one hash join keyed by gram hash + the
    * lag-islands interval union; the corpus is never re-read.
    *
    * Output: (idCol, n_spans, dup_tokens) — batch docs with no indexed
    * span are absent (nothing to act on).
    */
  def probe(index: DataFrame, batch: DataFrame, idCol: String,
            textCol: String, L: Int): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy("p")
    grams(batch, idCol, textCol, L)
      .join(index.select("gram_md5"), Seq("gram_md5"))
      .select(col(idCol), col("p"))
      .withColumn("f",
        when(lag("p", 1).over(w).isNull || col("p") - lag("p", 1).over(w) > L, 1)
          .otherwise(0))
      .withColumn("island", sum("f").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("island"))
      .agg(min("p").as("s"), (max(col("p")) + lit(L - 1)).as("e"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        sum((col("e") - col("s") + 1).cast("long")).as("dup_tokens"))
  }

  /** RETENTION repair — delete a doc set from the index without
    * rebuilding it (the GDPR/tombstone loop). Counts are repaired
    * INDEX-ONLY (decrement by the deleted docs' own gram counts — the
    * deleted docs are re-scanned, never the corpus); grams whose
    * canonical owner was deleted are re-elected from SURVIVOR
    * occurrences, with the survivor gram scan semi-joined down to
    * exactly the stale grams — the repair's shuffle is ∝ stale grams,
    * not index size. min() is not deletion-invertible, which is why
    * the stale slice (and only it) pays the re-election; q434 pins
    * repair ≡ rebuild-from-survivors row-for-row.
    */
  def retentionRepair(index: DataFrame, deleted: DataFrame,
                      survivors: DataFrame, idCol: String, textCol: String,
                      L: Int): DataFrame = {
    val dg = build(deleted, idCol, textCol, L)
      .select(col("gram_md5"), col("n_occ").as("d_n"))
    val dIds = deleted.select(col(idCol).as("__del_id")).distinct()
    val dec = index.join(dg, Seq("gram_md5"), "left")
      .select(col("gram_md5"), col("owner"),
        (col("n_occ") - coalesce(col("d_n"), lit(0L))).as("n_occ"))
      .filter(col("n_occ") > 0)
    val flagged = dec.join(dIds, col("owner") === col("__del_id"), "left")
      .withColumn("__stale", col("__del_id").isNotNull).drop("__del_id")
    val fresh = flagged.filter(!col("__stale"))
      .select("gram_md5", "owner", "n_occ")
    val stale = flagged.filter(col("__stale")).select("gram_md5", "n_occ")
    // counts were exact, so every stale gram with n_occ > 0 still has
    // survivor occurrences — the re-election inner join is total
    val reelect = grams(survivors, idCol, textCol, L)
      .join(stale.select("gram_md5"), Seq("gram_md5"))
      .groupBy("gram_md5").agg(min(col(idCol)).as("owner"))
    fresh.unionByName(
      stale.join(reelect, Seq("gram_md5"))
        .select(col("gram_md5"), col("owner"), col("n_occ")))
  }

  /** Append an ACCEPTED batch into the index: full-outer merge on the
    * gram hash with min/sum combination — exactly the summary a
    * from-scratch rebuild over corpus ∪ batch produces.
    */
  def merge(index: DataFrame, batch: DataFrame, idCol: String,
            textCol: String, L: Int): DataFrame = {
    val delta = build(batch, idCol, textCol, L)
      .withColumnRenamed("owner", "o2").withColumnRenamed("n_occ", "n2")
    index.join(delta, Seq("gram_md5"), "full_outer")
      .select(col("gram_md5"),
        coalesce(least(col("owner"), col("o2")),
          col("owner"), col("o2")).as("owner"),
        (coalesce(col("n_occ"), lit(0L)) + coalesce(col("n2"), lit(0L)))
          .as("n_occ"))
  }
}
