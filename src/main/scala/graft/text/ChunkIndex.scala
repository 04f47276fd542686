package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** PERSISTED content-defined-chunk index — the exact-chunk member of
  * the incremental-dedup index family (MinHash.bucketIndex for
  * near-dup, Similarity.embedCellIndex for semantic): a curation loop
  * writes the corpus's CDC chunk summary once, then every new batch
  * pays one chunking scan + one hash join against the index instead of
  * re-chunking the corpus.
  *
  * Index schema: (chunk_md5, keeper bigint, n_occ bigint) — one row per
  * DISTINCT chunk content. Both columns are mergeable (min / sum), so
  * [[merge]] over an accepted batch is EXACTLY the index rebuilt from
  * corpus ∪ batch (no frozen-parameter caveat: CDC boundaries depend
  * only on content, unlike the LSH index's frozen modulus) — q420 pins
  * merge ≡ rebuild row-for-row against the oracle.
  */
object ChunkIndex {

  /** One row per (doc, CDC chunk): (idCol, chunk_md5, n_toks). */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             modulus: Int): DataFrame =
    docs.select(col(idCol), explode(ColumnBridge.column(
        CdcChunkSet(ColumnBridge.expression(col(textCol)), modulus))).as("c"))
      .select(col(idCol), md5(col("c.chunk")).as("chunk_md5"),
        size(split(col("c.chunk"), " ")).as("n_toks"))

  /** Aggregate a corpus into the index summary (one row per distinct
    * chunk). The group key is the chunk hash — exchange rows ∝ distinct
    * chunks, never corpus size × chunk multiplicity.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
            modulus: Int): DataFrame =
    chunks(docs, idCol, textCol, modulus)
      .groupBy("chunk_md5")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_occ"))

  /** Probe a new batch against a persisted index: per batch document,
    * how many of its chunks (and how much token mass) already exist in
    * the indexed corpus. One chunking scan of the BATCH + one hash
    * join keyed by chunk hash — the corpus is never re-read.
    */
  def probe(index: DataFrame, batch: DataFrame, idCol: String,
            textCol: String, modulus: Int): DataFrame =
    chunks(batch, idCol, textCol, modulus)
      .join(index.select(col("chunk_md5"), lit(true).as("__hit")),
        Seq("chunk_md5"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_dup_idx"),
        sum(when(col("__hit"), col("n_toks").cast("long")).otherwise(0L))
          .as("dup_tokens"))

  /** Append an ACCEPTED batch into the index: full-outer merge on the
    * chunk hash with min/sum combination — exactly the summary a
    * from-scratch rebuild over corpus ∪ batch produces.
    */
  def merge(index: DataFrame, batch: DataFrame, idCol: String,
            textCol: String, modulus: Int): DataFrame = {
    val delta = build(batch, idCol, textCol, modulus)
      .withColumnRenamed("keeper", "k2").withColumnRenamed("n_occ", "n2")
    index.join(delta, Seq("chunk_md5"), "full_outer")
      .select(col("chunk_md5"),
        least(col("keeper"), col("k2")).as("k_min"),
        coalesce(col("keeper"), col("k2")).as("k_one"),
        (coalesce(col("n_occ"), lit(0L)) + coalesce(col("n2"), lit(0L))).as("n_occ"))
      // least() is null if either side is null — fall back to the
      // present side for index-only / batch-only chunks
      .select(col("chunk_md5"),
        coalesce(col("k_min"), col("k_one")).as("keeper"), col("n_occ"))
  }
}
