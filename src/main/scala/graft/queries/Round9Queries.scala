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
             FROM a LEFT JOIN d ON a.vec_id = d.vec_id"""),
      headline = true),

    // real BPE tokenization (Sennrich merges, pretrained table) — the
    // engine runs the rank-order merge kernel (text/Bpe.encodeKernel,
    // scan-stage, zero shuffles); the oracle applies the IDENTICAL
    // frozen merge table as delimiter-protected string replaces, which
    // for a well-formed table is the same algorithm (see Bpe scaladoc;
    // BpeSpec pins kernel ≡ fold-of-replaces bitwise). md5 of the
    // delimited representation pins every token boundary.
    "q217_bpe_tokenize" -> QueryDef(
      (s, d) => graft.text.Bpe.encodeKernel(
          Tables.documents(s, d), "doc_id", "text",
          graft.text.Bpe.Model(graft.text.BpeMerges.pretrained))
        .select(col("doc_id"), col("n_tok"), md5(col("bpe_repr")).as("bpe_md5")),
      Some(s"""WITH e AS (SELECT doc_id, $bpeReprSql AS r FROM documents)
             SELECT doc_id,
               CAST(len(r) - len(replace(r, '(', '')) AS BIGINT) AS n_tok,
               md5(r) AS bpe_md5
             FROM e"""),
      headline = true),

    // BPE vocabulary usage: corpus-wide token frequencies, top 30 —
    // the vocab-coverage check a tokenizer rollout runs (complement of
    // q177's whitespace-token variant). Explode is scan-stage; the agg
    // is one hashagg shuffle on the (tiny) token vocabulary; top-30 is
    // TakeOrderedAndProject, no global sort.
    "q218_bpe_vocab" -> QueryDef(
      (s, d) => graft.text.Bpe.encodeKernel(
          Tables.documents(s, d), "doc_id", "text",
          graft.text.Bpe.Model(graft.text.BpeMerges.pretrained))
        .select(explode(split(col("bpe_repr"), "[)( ]+")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc)
        .limit(30),
      Some(s"""WITH e AS (SELECT doc_id, $bpeReprSql AS r FROM documents),
             t AS (SELECT unnest(regexp_split_to_array(r, '[)( ]+')) AS tok FROM e)
             SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM t
             WHERE len(tok) > 0
             GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT 30""")),

    // STREAMING twin of q217: tokenize documents as they arrive. The
    // transform is a stateless scan-stage map, so streaming output ==
    // batch output row-for-row (no state/watermark to diverge); same
    // oracle as q217.
    "q219_stream_bpe" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.bpeStream(s, d),
      Some(s"""WITH e AS (SELECT doc_id, $bpeReprSql AS r FROM documents)
             SELECT doc_id,
               CAST(len(r) - len(replace(r, '(', '')) AS BIGINT) AS n_tok,
               md5(r) AS bpe_md5
             FROM e""")),

    // end-to-end sequence construction: BPE-count every document, lay
    // the corpus out as one token stream in doc_id order, cut it into
    // fixed 2048-token context windows (concat-then-chunk, the GPT
    // pretraining packing; a doc's window is determined by its START
    // offset). Composition: scan-stage BPE kernel → two-phase global
    // cumsum (no 1-partition window) → hashagg by window. Token sums
    // stay < 2^53, so the double-typed scan is exact.
    "q220_bpe_pack" -> QueryDef(
      (s, d) => {
        val counted = graft.text.Bpe.encodeKernel(
            Tables.documents(s, d), "doc_id", "text",
            graft.text.Bpe.Model(graft.text.BpeMerges.pretrained))
          .select(col("doc_id"), col("n_tok"))
        graft.operators.Cumulative.globalScan(
            counted, Seq("doc_id"), "n_tok", "cum",
            graft.operators.Cumulative.SumOp)
          .withColumn("seq", expr("(CAST(cum AS BIGINT) - n_tok) div 2048"))
          .groupBy("seq")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).cast("long").as("sum_tok"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
      },
      Some(s"""WITH e AS (SELECT doc_id, $bpeReprSql AS r FROM documents),
             n AS (SELECT doc_id,
                     CAST(len(r) - len(replace(r, '(', '')) AS BIGINT) AS n_tok
                   FROM e),
             c AS (SELECT doc_id, n_tok,
                     sum(n_tok) OVER (ORDER BY doc_id) AS cum FROM n)
             SELECT CAST((cum - n_tok) // 2048 AS BIGINT) AS seq,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS sum_tok,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
             FROM c GROUP BY 1"""))
  )

  /** DuckDB twin of Bpe.reprColumn over the frozen merge table: the
    * identical base representation and fold of replaces.
    */
  private[queries] def bpeReprSql: String = {
    val base = "regexp_replace(replace(replace(text, '(', ''), ')', ''), " +
      "'([^ ])', '(\\1)', 'g')"
    graft.text.BpeMerges.pretrained.foldLeft(base) { case (r, (x, y)) =>
      s"replace($r, '($x)($y)', '($x$y)')"
    }
  }
}
