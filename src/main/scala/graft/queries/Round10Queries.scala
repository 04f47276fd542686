package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.text.{Bpe, BpeMerges, Decontaminate}

/** Round-10 additions: the dataset-assembly end of the training
  * pipeline — decontamination, per-domain token budgets, and
  * temperature-flattened domain sampling. Numbering continues from
  * q220.
  */
object Round10Queries {

  /** DuckDB CTEs: word 4-gram shingle sets per document, keeping
    * `source` (the decontamination split key). Same tokenization as
    * TextQueries.shingleCte, one gram wider.
    */
  private val gram4Cte: String =
    """sh AS (
       SELECT doc_id, source, list_distinct(list_transform(range(len(t) - 3),
                i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS s
       FROM (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS t
             FROM documents))"""

  val defs: Seq[(String, QueryDef)] = Seq(

    // Decontamination (GPT-3 App. C / Dolma): flag corpus docs sharing
    // any word 4-gram with the eval split (source = 'src9' plays the
    // benchmark). Engine: shingle → bloom-gate in the scan stage →
    // exact semi-join verify (see Decontaminate scaladoc for the
    // 100 TB shape); oracle recomputes the overlap with an exact
    // inverted-index join. 4-grams give a partial hit rate on the
    // synthetic corpus (28/475 at sf0.01) — production uses 8-13.
    "q221_decontaminate" -> QueryDef(
      (s, d) => {
        // shingling kernel: spread the row-group-capped corpus scan
        // across cores (no-op at scale — see Tables.fanout)
        val docs = Tables.fanout(Tables.documents(s, d), d, "documents")
        Decontaminate.flag(
          docs.filter(col("source") =!= "src9"), "doc_id", "text",
          docs.filter(col("source") === "src9"), "text", n = 4)
      },
      Some(s"""WITH $gram4Cte,
             ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE source = 'src9'),
             hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS hit_grams
               FROM (SELECT doc_id, unnest(s) AS g FROM sh WHERE source <> 'src9') c
               JOIN ev USING (g) GROUP BY 1)
             SELECT d.doc_id,
               CAST(coalesce(hit_grams, 0) AS BIGINT) AS hit_grams,
               coalesce(hit_grams, 0) > 0 AS contaminated
             FROM (SELECT doc_id FROM documents WHERE source <> 'src9') d
             LEFT JOIN hits USING (doc_id)"""),
      headline = true),

    // Per-domain token budget: keep documents in doc_id order within
    // each source until the cumulative REAL BPE token count exceeds the
    // budget — the "fill each domain's share of the training mix" step.
    // Engine: Bpe.encodeWith appends n_tok in the scan stage (no
    // join-back shuffle); the running sum is a per-source window — one
    // shuffle on source, each group scanned once. Oracle applies the
    // identical frozen merge table as string replaces.
    "q222_token_budget" -> QueryDef(
      (s, d) => {
        val e = Bpe.encodeWith(
          Tables.documents(s, d).select("doc_id", "source", "text"),
          "text", Bpe.Model(BpeMerges.pretrained))
        val w = Window.partitionBy("source").orderBy("doc_id")
        e.withColumn("cum_tok", sum("n_tok").over(w))
          .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tok"),
            (col("cum_tok") <= 1536L).as("kept"))
      },
      Some(s"""WITH e AS (SELECT doc_id, source,
               CAST(len(r) - len(replace(r, '(', '')) AS BIGINT) AS n_tok
             FROM (SELECT doc_id, source, ${Round9Queries.bpeReprSql} AS r
                   FROM documents)),
             c AS (SELECT doc_id, source, n_tok,
               CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum_tok
             FROM e)
             SELECT doc_id, source, n_tok, cum_tok, cum_tok <= 1536 AS kept
             FROM c""")),

    // Temperature-flattened domain sampling: per-source keep target =
    // ceil(K * sqrt(share)) documents (exponent 1/2 = temperature-2
    // flattening — small domains over-sampled relative to size, the
    // standard multi-domain mixing rule), selected deterministically by
    // md5(doc_id) rank within the source. Every arithmetic step is a
    // single IEEE op on both engines (integer counts → divide → sqrt →
    // scale → ceil), so the targets match bitwise; ranks are exact.
    // Tiny aggregates broadcast; the only data-sized ops are one
    // groupBy(source) and the per-source rank window.
    "q223_temperature_sample" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "source")
        val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
        val tot = counts.agg(sum("n_src").as("n_tot"))
        val targets = counts.crossJoin(broadcast(tot))
          .select(col("source"),
            ceil(lit(100) * sqrt(col("n_src").cast("double") / col("n_tot")))
              .cast("long").as("target"))
        val w = Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        docs.join(broadcast(targets), Seq("source"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= col("target"))
          .select("doc_id", "source", "rk", "target")
      },
      Some("""WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
             t AS (SELECT source,
               CAST(ceil(100 * sqrt(n_src * 1.0 / (SELECT sum(n_src) FROM c))) AS BIGINT) AS target
             FROM c),
             r AS (SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
             FROM documents)
             SELECT r.doc_id, r.source, r.rk, t.target
             FROM r JOIN t USING (source) WHERE r.rk <= t.target""")),

    // The assembled curation pipeline through the GFrame API — quality
    // gate → decontaminate vs the eval split → real-BPE tokenize →
    // per-source token totals. Exercises the pipeline wrappers
    // end-to-end (each stage is oracle-proven alone by q102/q221/q217;
    // this pins their COMPOSITION and the wrapper plumbing). All three
    // text stages are scan-stage; the only data shuffles are the
    // decontamination candidate join and the final per-source hashagg.
    "q224_gframe_curation" -> QueryDef(
      (s, d) => {
        import graft.api.GFrame
        val docs = Tables.documents(s, d)
        val eval = GFrame(docs.filter(col("source") === "src9"))
        GFrame(docs.filter(col("source") =!= "src9")
            .select("doc_id", "source", "text"))
          .scoreQuality("text")
          .apply(col("quality") >= 0.5)
          .decontaminate("doc_id", "text", eval, "text", n = 4)
          .tokenizeBpe("text", Bpe.Model(BpeMerges.pretrained))
          .df.groupBy("source")
          .agg(sum("n_tok").as("tot_tok"), count(lit(1)).as("n_docs"))
      },
      Some(s"""WITH q AS (SELECT doc_id, source, text FROM documents
               WHERE source <> 'src9'
                 AND round((${TextQueries.qualitySql}) * 1e6) / 1e6 >= 0.5),
             tq AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM q),
             shq AS (SELECT doc_id, list_distinct(list_transform(range(len(t) - 3),
                       i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS s FROM tq),
             tev AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
                     FROM documents WHERE source = 'src9'),
             shev AS (SELECT list_distinct(list_transform(range(len(t) - 3),
                        i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS s FROM tev),
             ev AS (SELECT DISTINCT unnest(s) AS g FROM shev),
             bad AS (SELECT DISTINCT doc_id
               FROM (SELECT doc_id, unnest(s) AS g FROM shq) c JOIN ev USING (g)),
             clean AS (SELECT q.* FROM q LEFT JOIN bad ON q.doc_id = bad.doc_id
                       WHERE bad.doc_id IS NULL),
             e AS (SELECT doc_id, source,
               CAST(len(r) - len(replace(r, '(', '')) AS BIGINT) AS n_tok
             FROM (SELECT doc_id, source, ${Round9Queries.bpeReprSql} AS r FROM clean))
             SELECT source, CAST(sum(n_tok) AS BIGINT) AS tot_tok,
               CAST(count(*) AS BIGINT) AS n_docs
             FROM e GROUP BY 1""")),

    // STREAMING twin of q221: decontaminate documents as they arrive
    // against the static eval gram set (stateless scan-stage
    // intersect — see DocStreams.decontaminateStream). Same oracle as
    // q221; streaming output == batch output row-for-row.
    "q225_stream_decontaminate" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.decontaminateStream(s, d),
      Some(s"""WITH $gram4Cte,
             ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE source = 'src9'),
             hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS hit_grams
               FROM (SELECT doc_id, unnest(s) AS g FROM sh WHERE source <> 'src9') c
               JOIN ev USING (g) GROUP BY 1)
             SELECT d.doc_id,
               CAST(coalesce(hit_grams, 0) AS BIGINT) AS hit_grams,
               coalesce(hit_grams, 0) > 0 AS contaminated
             FROM (SELECT doc_id FROM documents WHERE source <> 'src9') d
             LEFT JOIN hits USING (doc_id)"""))
  )
}
