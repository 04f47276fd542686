package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC upsert — MERGE INTO semantics (q442/q443): a change batch with
  * I/U/D ops applied to a base table in ONE full-outer hash join — the
  * lakehouse table-maintenance shape. Sequential application over
  * key-disjoint change batches is associative, so the streaming twin
  * (microbatched `foreachBatch` loop over a versioned table directory)
  * lands the identical table regardless of batch boundaries.
  */
object CdcUpsert {

  /** Deterministic change-batch derivation used by the gates:
    * doc_id%30=0 → D(elete), %30=10 → U(pdate: text doubled),
    * %30=20 → I(nsert under doc_id+10^7).
    */
  def changesOf(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 10 === 0)
      .select(
        when(col("doc_id") % 30 === 20, col("doc_id") + 10000000L)
          .otherwise(col("doc_id")).as("doc_id"),
        when(col("doc_id") % 30 === 0, lit("D"))
          .when(col("doc_id") % 30 === 10, lit("U"))
          .otherwise(lit("I")).as("op"),
        concat(col("text"), lit(" "), col("text")).as("new_text"),
        col("source").as("new_source"))

  /** Apply one change batch: full-outer join on the key, D rows
    * dropped, U/I rows take the new payload. Base schema
    * (doc_id, text, source) is preserved.
    */
  def applyChanges(base: DataFrame, changes: DataFrame): DataFrame =
    base.join(changes, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(col("doc_id"),
        when(col("op").isNotNull, col("new_text"))
          .otherwise(col("text")).as("text"),
        coalesce(col("new_source"), col("source")).as("source"))

  /** The INVERSE of [[applyChanges]]: derive the I/U/D change set
    * between two table snapshots (q445 — data-versioning diff, the
    * "what changed between crawls" report and the input a downstream
    * incremental pipeline replays). ONE full-outer join; no-op rows
    * (same key, same text) are dropped, so
    * `deriveChanges(old, applyChanges(old, c))` recovers exactly the
    * EFFECTIVE subset of `c` (Round60Spec pins the round-trip).
    */
  def deriveChanges(oldT: DataFrame, newT: DataFrame): DataFrame = {
    val o = oldT.select(col("doc_id"), col("text").as("old_text"))
    val n = newT.select(col("doc_id"), col("text").as("new_text"))
    o.join(n, Seq("doc_id"), "full_outer")
      .filter(col("old_text").isNull || col("new_text").isNull ||
        col("old_text") =!= col("new_text"))
      .select(col("doc_id"),
        when(col("new_text").isNull, lit("D"))
          .when(col("old_text").isNull, lit("I"))
          .otherwise(lit("U")).as("op"),
        md5(col("new_text")).as("text_md5"))
  }
}
