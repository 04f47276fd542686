package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num

/** Round-31 additions: distributed ntile, lexical richness, Zipf
  * slope fitting, conversion-path mining.
  */
object Round31Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // ntile(4) over order totals WITHOUT a single-partition window:
    // the distributed two-phase global row number (repartitionByRange
    // + per-partition offsets — q295's machinery) feeds exact integer
    // bucket math, then a per-bucket rollup.  Money stays DECIMAL.
    "q339_ntile_quartiles" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          Num.dec2(col("o_totalprice")).as("tp"))
        val rn = graft.operators.Cumulative.globalRowNumber(
          o, Seq("tp", "o_orderkey"), "rn")
        val n = o.agg(count(lit(1)).as("n"))
        rn.crossJoin(broadcast(n))
          .select(col("tp"),
            (expr("((rn - 1) * 4) div n") + 1L).as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_orders"),
            min(col("tp")).cast("double").as("min_tp"),
            max(col("tp")).cast("double").as("max_tp"),
            round(sum(col("tp")), 2).cast("double").as("sum_tp"))
      },
      Some("""WITH o AS (SELECT o_orderkey,
              CAST(o_totalprice AS DECIMAL(12,2)) AS tp FROM orders),
          r AS (SELECT tp, CAST(row_number() OVER (ORDER BY tp, o_orderkey)
              AS BIGINT) AS rn FROM o),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o)
          SELECT ((rn - 1) * 4) // n + 1 AS bucket,
            CAST(count(*) AS BIGINT) AS n_orders,
            CAST(min(tp) AS DOUBLE) AS min_tp,
            CAST(max(tp) AS DOUBLE) AS max_tp,
            CAST(round(sum(tp), 2) AS DOUBLE) AS sum_tp
          FROM r, n GROUP BY 1""")),

    // Lexical richness per source: type-token ratio, hapax-legomena
    // share, mean token frequency — the vocabulary-health metrics of a
    // corpus audit.  One token-count pass (q299 tokenization), exact
    // integer ratios.
    "q340_lexical_richness" -> QueryDef(
      (s, d) => {
        val tc = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.text.TextStats.tokensNonEmpty(col("text"))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        tc.groupBy("source").agg(
            count(lit(1)).as("vocab"),
            sum(col("c")).as("tokens"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
          .select(col("source"), col("vocab"), col("tokens"), col("hapax"),
            Num.rnd(col("vocab").cast("double") / col("tokens").cast("double"), 6)
              .as("ttr"),
            Num.rnd(col("hapax").cast("double") / col("vocab").cast("double"), 6)
              .as("hapax_share"))
      },
      Some("""WITH tc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT source, unnest(list_filter(string_split(text, ' '),
                x -> x <> '')) AS w FROM documents)
            GROUP BY 1, 2)
          SELECT source, CAST(count(*) AS BIGINT) AS vocab,
            CAST(sum(c) AS BIGINT) AS tokens,
            CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
            round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) * 1e6) / 1e6
              AS ttr,
            round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) * 1e6) / 1e6 AS hapax_share
          FROM tc GROUP BY 1""")),

    // Zipf slope per source: OLS of ln(freq) on ln(rank) over the
    // top-100 terms (GroupTopK bounded heaps select them; the rank
    // window afterwards runs over ≤100 rows per source — bounded).
    // ln terms round to 6dp THEN sum as decimals (q153 transcendental
    // discipline), so the moments are order-independent and the slope
    // is the identical double expression on both engines.  A healthy
    // natural-language corpus sits near slope ≈ −1.
    "q341_zipf_slope" -> QueryDef(
      (s, d) => {
        val tc = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.text.TextStats.tokensNonEmpty(col("text"))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        val top = graft.plans.GroupTopK.topKPerKey(
          tc, Seq("source"), Seq(("c", true), ("w", false)), 100)
        val w100 = Window.partitionBy("source")
          .orderBy(col("c").desc, col("w"))
        val ranked = top.withColumn("i", row_number().over(w100).cast("long"))
          .select(col("source"),
            Num.rnd(log(col("i").cast("double")), 6).cast("decimal(18,6)").as("lr"),
            Num.rnd(log(col("c").cast("double")), 6).cast("decimal(18,6)").as("lf"))
        ranked.groupBy("source").agg(
            count(lit(1)).cast("double").as("n"),
            sum(col("lr")).cast("double").as("sx"),
            sum(col("lf")).cast("double").as("sy"),
            sum(col("lr") * col("lf")).cast("double").as("sxy"),
            sum(col("lr") * col("lr")).cast("double").as("sxx"))
          .select(col("source"),
            Num.rnd((col("n") * col("sxy") - col("sx") * col("sy"))
              / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
            Num.rnd((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
              / (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx"))
              / col("n"), 6).as("intercept"))
      },
      Some("""WITH tc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT source, unnest(list_filter(string_split(text, ' '),
                x -> x <> '')) AS w FROM documents)
            GROUP BY 1, 2),
          top AS (SELECT * FROM tc QUALIFY
            row_number() OVER (PARTITION BY source ORDER BY c DESC, w) <= 100),
          ranked AS (SELECT source,
              CAST(round(ln(CAST(row_number() OVER (PARTITION BY source
                  ORDER BY c DESC, w) AS DOUBLE)) * 1e6) / 1e6
                AS DECIMAL(18,6)) AS lr,
              CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) / 1e6
                AS DECIMAL(18,6)) AS lf
            FROM top),
          m AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(lr) AS DOUBLE) AS sx, CAST(sum(lf) AS DOUBLE) AS sy,
              CAST(sum(lr * lf) AS DOUBLE) AS sxy,
              CAST(sum(lr * lr) AS DOUBLE) AS sxx
            FROM ranked GROUP BY 1)
          SELECT source,
            round((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6) / 1e6 AS slope,
            round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
              * 1e6) / 1e6 AS intercept
          FROM m""")),

    // Conversion-path mining: per purchasing user, the ordered
    // event-type path up to and including the FIRST purchase, top-10
    // paths by frequency.  Per-user arrays are bounded (tens of
    // events), built with one grouped sort_array — no per-user window,
    // no driver loop; top-10 via TakeOrderedAndProject.
    "q342_conversion_paths" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            struct(expr("unix_micros(ts)").as("tus"),
              col("event_id"), col("event_type")).as("e"))
        val paths = ev.groupBy("user_id")
          .agg(sort_array(collect_list(col("e"))).as("arr"))
          .select(col("user_id"),
            expr("array_position(transform(arr, x -> x.event_type), 'purchase')")
              .as("idx"), col("arr"))
          .filter(col("idx") > 0)
          .select(concat_ws(">",
            expr("transform(slice(arr, 1, cast(idx as int)), x -> x.event_type)"))
            .as("path"))
        paths.groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path")).limit(10)
      },
      Some("""WITH arr AS (SELECT user_id,
              list(event_type ORDER BY epoch_us(ts), event_id) AS l
            FROM events GROUP BY 1),
          p AS (SELECT user_id, list_position(l, 'purchase') AS idx, l FROM arr),
          paths AS (SELECT array_to_string(l[1:idx], '>') AS path
            FROM p WHERE idx IS NOT NULL AND idx > 0),
          counts AS (SELECT path, CAST(count(*) AS BIGINT) AS n
            FROM paths GROUP BY 1)
          SELECT path, n FROM counts
          QUALIFY row_number() OVER (ORDER BY n DESC, path) <= 10"""))
  )
}
