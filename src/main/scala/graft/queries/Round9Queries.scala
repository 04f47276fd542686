package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.similarity.{IVF, IVFCentroids, Similarity}

/** Round-9 additions. Numbering continues from q215. */
object Round9Queries {

  import SimilarityQueries.{ivfCellSql, sqlCos}

  val defs: Seq[(String, QueryDef)] = Seq(

    // SemDeDup: cluster-scoped semantic dedup (Abbas et al. 2023) — the
    // scale path for embedding dedup. Cell assignment from the SAME
    // pretrained centroid literals as q91, pair search confined to a
    // cell, min-id dominance election (see Similarity.semDedup). The
    // oracle recomputes cell + within-cell dominance with the identical
    // double-precision formulas, so the kept flags hash-match. Contrast
    // q146, which is exact corpus-wide (quadratic by contract); this is
    // the bounded variant a 100 TB corpus actually runs.
    "q216_semdedup" -> QueryDef(
      (s, d) => Similarity.semDedup(
        Tables.embeddings(s, d), IVF.Model(IVFCentroids.pretrained), 0.4),
      Some(s"""WITH a AS (SELECT vec_id, embedding,
               CAST(${ivfCellSql("embedding")} AS INTEGER) AS cell
             FROM embeddings),
             d AS (SELECT DISTINCT x.vec_id
               FROM a x JOIN a y ON x.cell = y.cell AND y.vec_id < x.vec_id
                 AND round(${sqlCos("x.embedding", "y.embedding")} * 1e6) / 1e6 >= 0.4)
             SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS kept
             FROM a LEFT JOIN d ON a.vec_id = d.vec_id"""))
  )
}
