package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num

/** Round-26 additions: percentage ranks and seasonality heatmap. */
object Round26Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // pandas rank(pct=True): average rank / n — rides the distributed
    // RankMethods scan (dyadic-half ranks, one exact double division
    // per row).
    "q313_rank_pct" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        val n = o.count()
        graft.operators.RankMethods.rank(o, "o_totalprice", "r")
          .select(col("o_orderkey"), col("o_totalprice"),
            (col("r_avg") / lit(n.toDouble)).as("pct_rank"))
      },
      Some("""WITH c AS (SELECT o_totalprice AS v, CAST(count(*) AS DOUBLE) AS cnt
            FROM orders GROUP BY 1),
          cu AS (SELECT v, cnt, sum(cnt) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM c),
          r AS (SELECT v, ((cum - cnt + 1.0) + cum) / 2.0 AS r_avg FROM cu),
          n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM orders)
          SELECT o.o_orderkey, o.o_totalprice, r.r_avg / n.n AS pct_rank
          FROM orders o JOIN r ON o.o_totalprice = r.v CROSS JOIN n""")),

    // Seasonality heatmap: mean value by (day-of-week, hour-of-day) —
    // integer-µs day/hour math (Thursday epoch anchor: Jan 1 1970),
    // decimal-exact means.
    "q314_seasonality" -> QueryDef(
      (s, d) => Tables.events(s, d).filter(col("value").isNotNull)
        .select(expr("((unix_micros(ts) div 86400000000) + 4) % 7").as("dow"),
          expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
          Num.rnd(col("value"), 6).cast("decimal(18,6)").as("vr"))
        .groupBy("dow", "hod")
        .agg(count(lit(1)).as("n"),
          Num.rnd(sum(col("vr")).cast("double") / count(lit(1)), 6).as("mean_v")),
      Some("""SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
            (epoch_us(ts) // 3600000000) % 24 AS hod,
            CAST(count(*) AS BIGINT) AS n,
            round(CAST(sum(CAST(round(value * 1e6) / 1e6 AS DECIMAL(18,6))) AS DOUBLE)
              / count(*) * 1e6) / 1e6 AS mean_v
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2"""))
  )
}
