package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.text.MinHash

/** Round-42 addition: cross-source duplicate-leakage matrix. */
object Round42Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Cross-source duplicate leakage: the verified near-dup pairs
    // (q55's operating point) attributed to their source pair — the
    // "is my eval split contaminated by my train sources?" report
    // that decides decontamination scope before a training run.
    "q370_cross_source_dups" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        val pairs = MinHash.nearDuplicates(Tables.documents(s, d),
          "doc_id", "text", n = 3, threshold = 0.5)
        pairs
          .join(docs.select(col("doc_id").as("id1"), col("source").as("src1")),
            Seq("id1"))
          .join(docs.select(col("doc_id").as("id2"), col("source").as("src2")),
            Seq("id2"))
          .select(least(col("src1"), col("src2")).as("s1"),
            greatest(col("src1"), col("src2")).as("s2"))
          .groupBy("s1", "s2").agg(count(lit(1)).as("n_pairs"))
      },
      Some(s"""WITH ${TextQueries.pairsOracleCtes}
          SELECT least(a.source, b.source) AS s1,
            greatest(a.source, b.source) AS s2,
            CAST(count(*) AS BIGINT) AS n_pairs
          FROM pairs
          JOIN documents a ON pairs.id1 = a.doc_id
          JOIN documents b ON pairs.id2 = b.doc_id
          GROUP BY 1, 2"""))
  )
}
