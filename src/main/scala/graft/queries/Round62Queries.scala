package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Round-62 additions (build round 13, wave 5):
  *
  *  - q448 curation REJECTION AUDIT: one scan applies the whole rule
  *    chain (length, language allowlist, blocklist substring,
  *    repetition ratio) and attributes each rejected document to the
  *    FIRST failing rule — the per-source audit table every curation
  *    run ships with its output (what was dropped and why), turning
  *    the individual valves (q405/q402/q426/q160) into an accountable
  *    pipeline.
  *  - q449 TEMPERATURE-WEIGHTED deterministic source sampler: the
  *    actual multi-source training iterator (T5/PaLM-style sampling
  *    by n_s^α weights) — every global position p draws its source
  *    from md5(p) against the cumulative weight table, and consumes
  *    that source's next document in md5 order, wrapping (multi-epoch)
  *    when a source runs out. Both the position→source draw and both
  *    rank materializations are scan-stage arithmetic + the q427
  *    two-phase bucketed rank — no global window, no sequential state,
  *    fully deterministic, so DuckDB replays the identical schedule.
  */
object Round62Queries {

  private val allowedLangs = Seq("en", "fr", "es")

  /** First-failing-rule attribution (q448/q452): scan-stage CASE chain
    * over (text, lang).
    */
  private[queries] def reasonCol: org.apache.spark.sql.Column = {
    val toks = filter(split(col("text"), " "), x => x =!= "")
    when(size(toks) < 10, "too_short")
      .when(!col("lang").isin(allowedLangs: _*), "lang_filtered")
      .when(col("text").contains("slow query"), "blocklisted")
      .when(size(array_distinct(toks)).cast("double") /
        size(toks).cast("double") < 0.5, "repetitive")
      .otherwise("kept")
  }

  private[queries] val reasonOracleCase: String =
    s"""CASE
         WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) < 10
           THEN 'too_short'
         WHEN lang NOT IN (${allowedLangs.map(l => s"'$l'").mkString(", ")})
           THEN 'lang_filtered'
         WHEN contains(text, 'slow query') THEN 'blocklisted'
         WHEN CAST(len(list_distinct(list_filter(string_split(text, ' '),
             x -> x <> ''))) AS DOUBLE)
           / len(list_filter(string_split(text, ' '), x -> x <> '')) < 0.5
           THEN 'repetitive'
         ELSE 'kept'
       END"""

  // ---- q449 helpers ----------------------------------------------------

  private val Alpha = 0.5
  private val B = 1L << 16 // positions per rank bucket

  /** Per-source rank of each row ordered by `ord` (ascending, unique),
    * via the two-phase bucketed machinery: (source, ord/B) counts →
    * per-source exclusive prefix (tiny window) → broadcast join +
    * bucket-local row_number. Parallelism ∝ buckets at any scale.
    */
  private def bucketedRank(df: DataFrame, ord: String, out: String): DataFrame = {
    val keyed = df.withColumn("__b", (col(ord) / B).cast("long"))
    val offs = keyed.groupBy("source", "__b").agg(count(lit(1)).as("c"))
      .withColumn("__off", coalesce(
        sum("c").over(Window.partitionBy("source").orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("source", "__b", "__off")
    keyed.join(broadcast(offs), Seq("source", "__b"))
      .withColumn(out, col("__off") + row_number()
        .over(Window.partitionBy("source", "__b").orderBy(ord)).cast("long"))
      .drop("__b", "__off")
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    "q448_reject_audit" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("source"), reasonCol.as("reason"))
        .groupBy("source", "reason")
        .agg(count(lit(1)).as("n_docs")),
      Some(s"""WITH r AS (SELECT source, $reasonOracleCase AS reason
             FROM documents)
             SELECT source, reason, CAST(count(*) AS BIGINT) AS n_docs
             FROM r GROUP BY 1, 2""")),

    "q449_temperature_sampler" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val (totals, n, cums, z) = samplerWeights(s, d)
        // position spine: p = 0..n-1; u(p) = first 15 md5 hex digits / 2^60
        val pos = s.range(n).select(col("id").as("p"))
          .withColumn("u",
            conv(substring(md5(concat(lit("ts:"), col("p").cast("string"))), 1, 15),
              16, 10).cast("long").cast("double") / lit((1L << 60).toDouble))
        // first source (sorted) whose cumulative weight exceeds u·z;
        // default = last source. cums/z come off the exact 6dp-decimal
        // grid, so CAST-to-double agrees bit-for-bit with the oracle.
        val srcCase = totals.map(_._1).zip(cums).dropRight(1)
          .foldRight(lit(totals.last._1): org.apache.spark.sql.Column) {
            case ((src, c), rest) =>
              when(col("u") * lit(z) < lit(c), lit(src)).otherwise(rest)
          }
        val chosen = pos.select(col("p"), srcCase.as("source"))
        // rank of p within its source (two-phase bucketed), wrapped into
        // the source's document count (multi-epoch consumption)
        val ranked = bucketedRank(chosen, "p", "rn")
        val nsCase = totals.dropRight(1)
          .foldRight(lit(totals.last._2): org.apache.spark.sql.Column) {
            case ((src, c), rest) => when(col("source") === src, lit(c)).otherwise(rest)
          }
        val want = ranked.withColumn("doc_rank",
          pmod(col("rn") - 1, nsCase) + 1)
        // per-source document order: md5(doc_id), two-phase bucketed on
        // the md5 prefix (the q428 machinery)
        val docRank = {
          val keyed = docs.select(col("doc_id"), col("source"))
            .withColumn("h", md5(col("doc_id").cast("string")))
            .withColumn("__b", substring(col("h"), 1, 2))
          val offs = keyed.groupBy("source", "__b").agg(count(lit(1)).as("c"))
            .withColumn("__off", coalesce(
              sum("c").over(Window.partitionBy("source").orderBy("__b")
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
            .select("source", "__b", "__off")
          keyed.join(broadcast(offs), Seq("source", "__b"))
            .withColumn("doc_rank", col("__off") + row_number()
              .over(Window.partitionBy("source", "__b").orderBy("h")).cast("long"))
            .select("source", "doc_rank", "doc_id")
        }
        want.join(docRank, Seq("source", "doc_rank"))
          .select(col("p"), col("source"), col("doc_id"))
      },
      Some(s"""WITH tot AS (SELECT source, CAST(count(*) AS BIGINT) AS c
              FROM documents GROUP BY 1),
            w AS (SELECT source, c,
                CAST(round(pow(CAST(c AS DOUBLE), $Alpha), 6) AS DECIMAL(18,6))
                  AS w6
              FROM tot),
            z AS (SELECT CAST(sum(w6) AS DOUBLE) AS z FROM w),
            cw AS (SELECT source,
                CAST(sum(w6) OVER (ORDER BY source) AS DOUBLE) AS cum
              FROM w),
            pos AS (SELECT p,
                CAST(CAST(('0x' || substr(md5('ts:' || CAST(p AS VARCHAR)), 1, 15))
                  AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
              FROM (SELECT unnest(range((SELECT CAST(sum(c) AS BIGINT) FROM tot)))
                AS p)),
            chosen AS (SELECT p.p, COALESCE(
                (SELECT min(cw.source) FROM cw, z WHERE p.u * z.z < cw.cum),
                (SELECT max(source) FROM cw)) AS source
              FROM pos p),
            rk AS (SELECT p, source,
                row_number() OVER (PARTITION BY source ORDER BY p) AS rn
              FROM chosen),
            want AS (SELECT rk.p, rk.source,
                ((rk.rn - 1) % t.c) + 1 AS doc_rank
              FROM rk JOIN tot t ON t.source = rk.source),
            dr AS (SELECT source, doc_id,
                row_number() OVER (PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR))) AS doc_rank
              FROM documents)
            SELECT w2.p, w2.source, dr.doc_id
            FROM want w2 JOIN dr ON dr.source = w2.source
              AND dr.doc_rank = w2.doc_rank"""))
  )

  /** Per-source counts (sorted), total, cumulative 6dp-grid weights
    * (n_s^α rounded to the grid, DECIMAL-summed — exact), and the grid
    * total z — the literals the sampler folds into its scan-stage CASE.
    * The pow→rnd6 step is the repo's accepted transcendental risk
    * (q153 discipline); everything after it is exact decimal.
    */
  private def samplerWeights(s: SparkSession, d: String)
      : (Seq[(String, Long)], Long, Seq[Double], Double) = {
    val rows = Tables.documents(s, d).groupBy("source")
      .agg(count(lit(1)).as("c"))
      .select(col("source"), col("c"),
        (graft.functions.Num.rnd(pow(col("c").cast("double"), Alpha), 6))
          .cast("decimal(18,6)").as("w6"))
      .collect().sortBy(_.getString(0))
    val totals = rows.map(r => (r.getString(0), r.getLong(1))).toSeq
    val w6 = rows.map(r => BigDecimal(r.getDecimal(2))).toSeq
    val cums = w6.scanLeft(BigDecimal(0))(_ + _).tail.map(_.doubleValue)
    (totals, totals.map(_._2).sum, cums, w6.sum.doubleValue)
  }
}
