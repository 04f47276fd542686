package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.text.GramIndex

/** Round-57 additions (build round 12, wave 13): q434 RETENTION delete
  * with index repair — the deletion leg of the persisted-index story
  * (every other index op is append-only). A delete set leaves the
  * corpus AND the gram index must follow: counts decrement INDEX-ONLY
  * (only the deleted docs are re-scanned), and the grams whose
  * canonical owner was deleted are re-elected from survivors with the
  * survivor scan semi-joined down to exactly the stale grams. Pinned
  * repair ≡ rebuild-from-survivors. Delete fixture: doc_id % 7 = 0.
  */
object Round57Queries {

  private val L = 8

  val defs: Seq[(String, QueryDef)] = Seq(

    "q434_retention_delete" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val deleted = docs.filter(col("doc_id") % 7 === 0)
        val survivors = docs.filter(col("doc_id") % 7 =!= 0)
        val safe = d.replaceAll("[^A-Za-z0-9.]", "_")
        val path = s"/root/repo/target/tmp/gram_index_full_$safe"
        GramIndex.build(docs, "doc_id", "text", L)
          .write.mode("overwrite").parquet(path)
        GramIndex.retentionRepair(s.read.parquet(path), deleted, survivors,
          "doc_id", "text", L)
      },
      Some(s"""WITH tk AS (SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS toks
               FROM documents WHERE doc_id % 7 != 0),
             gr AS (SELECT doc_id, p,
                 md5(array_to_string(toks[p:p+${L - 1}], ' ')) AS h
               FROM tk, unnest(range(1, len(toks) - ${L - 2})) t(p))
             SELECT h AS gram_md5, min(doc_id) AS owner,
               CAST(count(*) AS BIGINT) AS n_occ
             FROM gr GROUP BY 1"""))
  )
}
