package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-level corpus deduplication — the C4/RefinedWeb curation step
  * that REWRITES documents instead of dropping them: every k-token
  * chunk that already occurred earlier in the corpus (global order:
  * (doc_id, chunk index)) is removed, and each document is reassembled
  * from its surviving chunks. Distinct from near-dup detection
  * (MinHash/SimHash report PAIRS; this transforms the text) and from
  * SubstringDup (which scores overlap but does not rewrite).
  *
  * Scale shape: one explode to (chunk, doc, idx), one hash-keyed
  * partial-aggregatable min to elect each chunk's first occurrence
  * (the shuffle carries a 16-byte hash + a (long,int) struct — never
  * the chunk text twice), one equi-join back, and one per-doc
  * reassembly groupBy. No windows, no driver-side state; every stage
  * is a plain hash shuffle that scales with corpus size.
  *
  * The stages are exposed separately so the election can also run over
  * a STREAM ([[graft.streaming.DocStreams.chunkDedupStream]]): `min`
  * is order-independent, so the streamed election converges to the
  * batch answer regardless of microbatch boundaries.
  */
object ChunkDedup {

  /** Explode to one row per chunk: (idCol, idx, chunk, h) where h is
    * the 16-hex-char md5 prefix used as the dedup key. Stateless —
    * works identically on a batch frame or a streaming source.
    */
  def chunks(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol),
        expr(s"filter(split($textCol, ' '), x -> x != '')").as("__t"))
      .filter(size(col("__t")) > 0)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, cast((size(__t) + ${k - 1}) / $k as int) - 1), " +
          s"i -> struct(i as idx, array_join(slice(__t, i * $k + 1, $k), ' ') as chunk))"))
        .as("c"))
      .select(col(idCol), col("c.idx").as("idx"),
        col("c.chunk").as("chunk"),
        substring(md5(col("c.chunk")), 1, 16).as("h"))

  /** First global occurrence per chunk hash: partial-aggregatable
    * lexicographic min over (doc_id, idx) — no window sort. On a
    * stream this is the one stateful operator (state = 16-byte key +
    * one (long,int) struct per distinct chunk).
    */
  def elect(chunksDf: DataFrame, idCol: String): DataFrame =
    chunksDf.groupBy(col("h").as("kh"))
      .agg(min(struct(col(idCol), col("idx"))).as("keep"))

  /** Join the election back to the (batch) chunk set and reassemble
    * each document from its surviving chunks, in order.
    */
  def assemble(df: DataFrame, chunksDf: DataFrame, elected: DataFrame,
               idCol: String): DataFrame = {
    val kept = chunksDf.join(elected,
      col("h") === col("kh") &&
        col(idCol) === col(s"keep.$idCol") && col("idx") === col("keep.idx"))
      .select(col(idCol), col("idx"), col("chunk"))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(
        array_join(expr("transform(sort_array(collect_list(struct(idx, chunk))), x -> x.chunk)"),
          " ").as("text_clean"),
        count(lit(1)).as("n_kept"))
    val totals = chunksDf.groupBy(col(idCol)).agg(count(lit(1)).as("n_total"))
    df.select(col(idCol))
      .join(totals, Seq(idCol), "left_outer")
      .join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_total"), lit(0L)).as("n_total"))
  }

  /** Rewrite `df` keeping only globally-first occurrences of each
    * `k`-token chunk.
    *
    * Output: (idCol, text_clean, n_kept, n_total) — one row per input
    * document; a document whose every chunk is a repeat survives with
    * empty text (n_kept = 0), mirroring C4's span removal (the
    * downstream length filter is a separate policy decision).
    *
    * Batch plan (r12 reshape): the election carries the chunk TEXT
    * along with the winner (all chunks sharing an md5-prefix key are
    * identical text, collision odds 2^-64), so the winning rows ARE the
    * kept set — no join back to the exploded chunks, and the explode
    * runs ONCE instead of three times (elect + join side + totals).
    * `n_total` falls out of token counts in the base scan
    * (ceil(n_tokens/k)), not a second explode. Two shuffles total
    * (by chunk hash, then by winning doc) + one 1-row-per-doc join —
    * each a plain hash exchange that scales with corpus size. The
    * staged `chunks`/`elect`/`assemble` operators remain for the
    * streaming twin, whose state must not carry chunk text.
    */
  def rewrite(df: DataFrame, idCol: String, textCol: String, k: Int = 10): DataFrame = {
    val c = chunks(df, idCol, textCol, k)
    val elected = c.groupBy(col("h"))
      .agg(min(struct(col(idCol), col("idx"))).as("keep"),
        first(col("chunk")).as("chunk"))
    val rebuilt = elected.groupBy(col(s"keep.$idCol").as(idCol))
      .agg(
        array_join(expr("transform(sort_array(collect_list(struct(keep.idx as idx, chunk))), x -> x.chunk)"),
          " ").as("text_clean"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol),
        coalesce(
          expr(s"cast(ceil(size(filter(split($textCol, ' '), x -> x != '')) / cast($k as double)) as bigint)"),
          lit(0L)).as("n_total"))
      .join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("n_total"))
  }
}
