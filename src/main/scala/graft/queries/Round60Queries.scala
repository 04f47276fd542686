package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Round-60 additions (build round 13, wave 3):
  *
  *  - q444 RETENTION delete for the persisted embedding-cell index —
  *    the GDPR/tombstone leg the gram index already has (q434), closing
  *    the family gap: deletion is ONE index-only anti-join (rows carry
  *    their vec_id; no re-election needed, unlike gram owners), the
  *    frozen fold modulus survives, and the post-delete probe must
  *    behave exactly as a probe against an index rebuilt from the
  *    survivors — which is what the oracle computes from scratch.
  *  - q445 snapshot DIFF: derive the I/U/D change set between two table
  *    versions (the inverse of q442's MERGE apply) — the
  *    "what changed between crawls" report and the feed an incremental
  *    downstream pipeline replays. One full-outer join; no-op updates
  *    dropped.
  */
object Round60Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    "q444_embed_index_retention" -> QueryDef(
      (s, d) => {
        val em = Tables.embeddings(s, d)
        val corpus = em.filter(col("vec_id") % 97 =!= 0)
        val batch = em.filter(col("vec_id") % 97 === 0)
        val deleted = corpus.filter(col("vec_id") % 7 === 3).select("vec_id")
        val idx = graft.similarity.Similarity.embedCellIndex(corpus, tables = 4)
        val repaired = graft.similarity.Similarity
          .retentionDeleteEmbedIndex(idx, deleted)
        val survivors = corpus.filter(col("vec_id") % 7 =!= 3)
        graft.similarity.Similarity
          .probeEmbedIndex(repaired, batch, survivors, 0.4)
      },
      Some {
        // Rebuilt-from-survivors probe — but the fold modulus stays the
        // BUILD-time one (derived from the FULL pre-delete corpus
        // count): the retention contract freezes C at build.
        val tables = (0 until 4).map { t =>
          s"""SELECT $t AS t, vec_id,
               CAST(${SimilarityQueries.sigSql32At("embedding", 7L + t)} % cc.c
                 AS BIGINT) AS cell
             FROM embeddings CROSS JOIN cc
             WHERE vec_id % 97 != 0 AND vec_id % 7 != 3"""
        }.mkString(" UNION ALL ")
        val probes = (0 until 4).map { t =>
          s"""SELECT $t AS t, vec_id AS new_id,
               CAST(${SimilarityQueries.sigSql32At("embedding", 7L + t)} % cc.c
                 AS BIGINT) AS cell
             FROM embeddings CROSS JOIN cc WHERE vec_id % 97 = 0"""
        }.mkString(" UNION ALL ")
        s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings
              WHERE vec_id % 97 != 0),
          cc AS (SELECT greatest(1, (n + 255) // 256) AS c FROM nn),
          idx AS ($tables),
          probes AS ($probes),
          cand AS (SELECT DISTINCT p.new_id, i.vec_id AS corpus_id
            FROM probes p JOIN idx i ON i.t = p.t AND i.cell = p.cell
            WHERE p.new_id != i.vec_id),
          m AS (SELECT cand.new_id, CAST(count(*) AS BIGINT) AS n_matches
            FROM cand
            JOIN embeddings a ON a.vec_id = cand.new_id
            JOIN embeddings b ON b.vec_id = cand.corpus_id
            WHERE round(${SimilarityQueries.sqlCosPub("a.embedding", "b.embedding")}
              * 1e6) / 1e6 >= 0.4
            GROUP BY 1)
          SELECT e.vec_id AS new_id,
            coalesce(m.n_matches, 0) AS n_matches,
            (coalesce(m.n_matches, 0) > 0) AS is_dup
          FROM embeddings e LEFT JOIN m ON e.vec_id = m.new_id
          WHERE e.vec_id % 97 = 0"""
      }),

    "q445_snapshot_diff" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val base = docs.select(col("doc_id"), col("text"), col("source"))
        val next = graft.operators.CdcUpsert.applyChanges(
          base, graft.operators.CdcUpsert.changesOf(docs))
        graft.operators.CdcUpsert.deriveChanges(base, next)
      },
      Some("""WITH changes AS (SELECT
               CASE WHEN doc_id % 30 = 20 THEN doc_id + 10000000 ELSE doc_id END
                 AS doc_id,
               CASE WHEN doc_id % 30 = 0 THEN 'D'
                    WHEN doc_id % 30 = 10 THEN 'U' ELSE 'I' END AS op,
               text || ' ' || text AS new_text
             FROM documents WHERE doc_id % 10 = 0),
             newt AS (SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
                 CASE WHEN c.op IS NOT NULL THEN c.new_text ELSE b.text END
                   AS text
               FROM documents b FULL OUTER JOIN changes c
                 ON b.doc_id = c.doc_id
               WHERE COALESCE(c.op, '') != 'D')
             SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN n.doc_id IS NULL THEN 'D'
                    WHEN o.doc_id IS NULL THEN 'I' ELSE 'U' END AS op,
               md5(n.text) AS text_md5
             FROM documents o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id
             WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text != n.text"""))
  )
}
