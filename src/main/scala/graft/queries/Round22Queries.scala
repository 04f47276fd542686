package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num

/** Round-22 additions: Spearman rank correlation, lag-1
  * autocorrelation, cross-source vocabulary overlap, vocabulary
  * entropy.
  */
object Round22Queries {

  /** DuckDB average-rank table for `src` (expr over a value column):
    * per-value counts + cum window + the RankMethods (min+max)/2
    * arithmetic — the distinct-value domain keeps the window tiny.
    */
  private def rankCte(name: String, from: String, v: String): String =
    s"""${name}_c AS (SELECT $v AS v, CAST(count(*) AS DOUBLE) AS cnt
          FROM $from GROUP BY 1),
        ${name}_u AS (SELECT v, cnt, sum(cnt) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM ${name}_c),
        $name AS (SELECT v, ((cum - cnt + 1.0) + cum) / 2.0 AS r
          FROM ${name}_u)"""

  val defs: Seq[(String, QueryDef)] = Seq(

    // Spearman rank correlation between value and the JSON `k`
    // property: both rank columns come from the DISTRIBUTED
    // RankMethods scan; average ranks are dyadic halves, so the
    // DECIMAL(18,1) moment sums are exact and order-independent —
    // q157's Pearson discipline applied to ranks.
    "q297_spearman" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("value"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .filter(col("value").isNotNull && col("k").isNotNull)
        val ranked = graft.operators.RankMethods.rank(
          graft.operators.RankMethods.rank(ev, "value", "rx"), "k", "ry")
        val x = col("rx_avg").cast("decimal(18,1)")
        val y = col("ry_avg").cast("decimal(18,1)")
        ranked.agg(count(lit(1)).as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum(x * y).cast("decimal(38,2)").as("sxy"),
            sum(x * x).cast("decimal(38,2)").as("sxx"),
            sum(y * y).cast("decimal(38,2)").as("syy"))
          .select(col("n"),
            Num.rnd((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
              .as("spearman"))
      },
      Some(s"""WITH ev AS (SELECT event_id, value,
            CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT) AS k
          FROM events
          WHERE value IS NOT NULL
            AND nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '') IS NOT NULL),
          ${rankCte("rx", "ev", "value")},
          ${rankCte("ry", "ev", "k")},
          j AS (SELECT CAST(rx.r AS DECIMAL(18,1)) AS x,
              CAST(ry.r AS DECIMAL(18,1)) AS y
            FROM ev JOIN rx ON ev.value = rx.v JOIN ry ON ev.k = ry.v),
          m AS (SELECT CAST(count(*) AS BIGINT) AS n,
              sum(x) AS sx, sum(y) AS sy,
              CAST(sum(x * y) AS DECIMAL(38,2)) AS sxy,
              CAST(sum(x * x) AS DECIMAL(38,2)) AS sxx,
              CAST(sum(y * y) AS DECIMAL(38,2)) AS syy
            FROM j)
          SELECT n, round(CAST(n * sxy - sx * sy AS DOUBLE) /
            sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
               * CAST(n * syy - sy * sy AS DOUBLE)) * 1e6) / 1e6 + 0 AS spearman
          FROM m""")),

    // Lag-1 autocorrelation of the hourly mean-value series: bucketed
    // means (exact decimal / count, 6dp-rounded) self-joined on
    // bucket+1 — a distributed equi-join over the bounded bucket
    // domain, never a global-order window — then q157's exact-decimal
    // Pearson over the (m_t, m_{t+1}) pairs.
    "q298_autocorr" -> QueryDef(
      (s, d) => {
        val hourly = Tables.events(s, d).filter(col("value").isNotNull)
          .select(expr("unix_micros(ts) div 3600000000").as("h"),
            Num.rnd(col("value"), 6).cast("decimal(18,6)").as("vr"))
          .groupBy("h")
          .agg(Num.rnd(sum(col("vr")).cast("double") / count(lit(1)), 6)
            .cast("decimal(18,6)").as("m"))
        val pairs = hourly.as("a")
          .join(hourly.as("b"), col("a.h") + 1 === col("b.h"))
          .select(col("a.m").as("x"), col("b.m").as("y"))
        pairs.agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).cast("decimal(38,12)").as("sxy"),
            sum(col("x") * col("x")).cast("decimal(38,12)").as("sxx"),
            sum(col("y") * col("y")).cast("decimal(38,12)").as("syy"))
          .select(col("n"),
            Num.rnd((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
              .as("autocorr"))
      },
      Some("""WITH hourly AS (SELECT epoch_us(ts) // 3600000000 AS h,
            CAST(round(CAST(sum(CAST(round(value * 1e6) / 1e6 AS DECIMAL(18,6))) AS DOUBLE)
              / count(*) * 1e6) / 1e6 AS DECIMAL(18,6)) AS m
          FROM events WHERE value IS NOT NULL GROUP BY 1),
          p AS (SELECT a.m AS x, b.m AS y FROM hourly a
            JOIN hourly b ON a.h + 1 = b.h),
          mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
              sum(x) AS sx, sum(y) AS sy,
              CAST(sum(x * y) AS DECIMAL(38,12)) AS sxy,
              CAST(sum(x * x) AS DECIMAL(38,12)) AS sxx,
              CAST(sum(y * y) AS DECIMAL(38,12)) AS syy
            FROM p)
          SELECT n, round(CAST(n * sxy - sx * sy AS DOUBLE) /
            sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
               * CAST(n * syy - sy * sy AS DOUBLE)) * 1e6) / 1e6 + 0 AS autocorr
          FROM mo""")),

    // Cross-source vocabulary overlap matrix: distinct (source, word)
    // pairs self-joined on word (inverted-index shape, the q54
    // pattern at source granularity) → pairwise Jaccard of the
    // vocabularies.
    "q299_source_overlap" -> QueryDef(
      (s, d) => {
        val sw = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.text.TextStats.tokensNonEmpty(col("text"))).as("w"))
          .distinct()
        val sizes = sw.groupBy("source").agg(count(lit(1)).as("sz"))
        val inter = sw.as("a").join(sw.as("b"),
            col("a.w") === col("b.w") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
          .agg(count(lit(1)).as("inter"))
        inter.join(sizes.withColumnRenamed("source", "s1")
            .withColumnRenamed("sz", "n1"), "s1")
          .join(sizes.withColumnRenamed("source", "s2")
            .withColumnRenamed("sz", "n2"), "s2")
          .select(col("s1"), col("s2"), col("inter"),
            Num.rnd(col("inter").cast("double") /
              (col("n1") + col("n2") - col("inter")).cast("double"), 6).as("jaccard"))
      },
      Some("""WITH sw AS (SELECT DISTINCT source, unnest(list_filter(
              string_split(text, ' '), x -> x <> '')) AS w FROM documents),
          sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM sw GROUP BY 1),
          i AS (SELECT a.source AS s1, b.source AS s2,
              CAST(count(*) AS BIGINT) AS inter
            FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
            GROUP BY 1, 2)
          SELECT i.s1, i.s2, i.inter,
            round(CAST(i.inter AS DOUBLE) /
              CAST(z1.sz + z2.sz - i.inter AS DOUBLE) * 1e6) / 1e6 AS jaccard
          FROM i JOIN sz z1 ON z1.source = i.s1 JOIN sz z2 ON z2.source = i.s2""")),

    // Vocabulary entropy per source over the 64 hashed buckets
    // (Shannon H = −Σ p·ln p): each ln term rounds to 6dp FIRST, then
    // the 64 terms sum as exact DECIMAL — q153's transcendental
    // discipline (raw ln ulps differ between libm builds; the round +
    // decimal-sum makes the aggregate order-independent and
    // cross-engine stable).
    "q300_vocab_entropy" -> QueryDef(
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.text.TextStats.tokensNonEmpty(col("text"))).as("w"))
        val counts = toks.groupBy(col("source"),
            (conv(substring(md5(col("w")), 1, 4), 16, 10).cast("int") % 64).as("b"))
          .agg(count(lit(1)).as("c"))
        val tot = counts.groupBy("source").agg(sum(col("c")).as("t"))
        counts.join(tot, "source")
          .select(col("source"),
            Num.rnd(-(col("c").cast("double") / col("t").cast("double"))
              * log(col("c").cast("double") / col("t").cast("double")), 6)
              .cast("decimal(18,6)").as("term"))
          .groupBy("source")
          .agg(sum(col("term")).cast("double").as("entropy"))
      },
      Some("""WITH toks AS (SELECT source, unnest(list_filter(
              string_split(text, ' '), x -> x <> '')) AS w FROM documents),
          c AS (SELECT source,
              CAST(('0x' || substr(md5(w), 1, 4)) AS INT) % 64 AS b,
              CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2),
          t AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY 1),
          terms AS (SELECT c.source,
              CAST(round(-(CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE))
                * ln(CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE)) * 1e6) / 1e6
                AS DECIMAL(18,6)) AS term
            FROM c JOIN t ON c.source = t.source)
          SELECT source, CAST(sum(term) AS DOUBLE) AS entropy
          FROM terms GROUP BY 1"""))
  )
}
