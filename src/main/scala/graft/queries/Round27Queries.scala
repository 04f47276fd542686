package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num

/** Round-27 additions: per-group Gini coefficient, streaming
  * seasonality twin.
  */
object Round27Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Per-group Gini coefficient of the value distribution:
    // G = Σᵢ (2i − n − 1)·xᵢ / (n·Σx) over per-group sorted values —
    // ranks from a per-group window (groups are event types: few,
    // large, the house grouped-window pattern), the weighted sum in
    // exact DECIMAL (rank weights are exact integers, values 6dp) so
    // the aggregate is order-independent.
    "q317_group_gini" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("value").isNotNull)
          .select(col("event_type"),
            Num.rnd(col("value"), 6).cast("decimal(18,6)").as("vr"),
            col("event_id"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("vr"), col("event_id"))
        val ranked = ev.withColumn("i", row_number().over(w).cast("long"))
        ranked.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("vr")).as("sx"),
            sum((col("i") * 2).cast("decimal(18,0)") * col("vr")).as("swx"))
          .select(col("event_type"),
            Num.rnd((col("swx").cast("double")
              - (col("n") + 1).cast("double") * col("sx").cast("double"))
              / (col("n").cast("double") * col("sx").cast("double")), 6).as("gini"))
      },
      Some("""WITH ev AS (SELECT event_type,
            CAST(round(value * 1e6) / 1e6 AS DECIMAL(18,6)) AS vr, event_id
          FROM events WHERE value IS NOT NULL),
          r AS (SELECT event_type, vr,
              CAST(row_number() OVER (PARTITION BY event_type
                ORDER BY vr, event_id) AS BIGINT) AS i
            FROM ev),
          m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              sum(vr) AS sx,
              sum(CAST(i * 2 AS DECIMAL(18,0)) * vr) AS swx
            FROM r GROUP BY 1)
          SELECT event_type,
            round((CAST(swx AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(sx AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e6) / 1e6 AS gini
          FROM m""")),

    // §2.10 streaming seasonality: the q314 (dow × hod) heatmap
    // maintained as a running streaming aggregation (state = one row
    // per cell, ≤ 168) — same oracle, bounded replay ≡ batch.
    "q318_stream_seasonality" -> QueryDef(
      (s, d) => graft.streaming.EventStreams.seasonalityStream(s, d),
      Some("""SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
            (epoch_us(ts) // 3600000000) % 24 AS hod,
            CAST(count(*) AS BIGINT) AS n,
            round(CAST(sum(CAST(round(value * 1e6) / 1e6 AS DECIMAL(18,6))) AS DOUBLE)
              / count(*) * 1e6) / 1e6 AS mean_v
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2""")),

    // Leakage-safe TEMPORAL train/test split (the time-series
    // companion of q257's group-level split): cutoff = exact 80th
    // percentile of event time, everything at-or-before trains.  One
    // percentile pass + one broadcast compare; the boundary is exact
    // integer µs.
    "q319_temporal_split" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), expr("unix_micros(ts)").as("tus"))
        val cut = ev.agg(expr("percentile(tus, 0.8)").as("cut"))
        ev.crossJoin(broadcast(cut))
          .select(when(col("tus") <= col("cut"), lit("train"))
            .otherwise(lit("test")).as("split"))
          .groupBy("split").agg(count(lit(1)).as("n"))
      },
      Some("""WITH ev AS (SELECT event_id, epoch_us(ts) AS tus FROM events),
          c AS (SELECT quantile_cont(tus, 0.8) AS cut FROM ev)
          SELECT CASE WHEN ev.tus <= c.cut THEN 'train' ELSE 'test' END AS split,
            CAST(count(*) AS BIGINT) AS n
          FROM ev, c GROUP BY 1""")),

    // Class-balance report with inverse-frequency reweighting
    // (w_c = N / (K·n_c), the standard imbalanced-training weights):
    // one grouped count + one 1-row broadcast, exact arithmetic.
    "q320_class_weights" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
        val tot = counts.agg(sum(col("n_docs")).as("total"),
          count(lit(1)).as("k"))
        counts.crossJoin(broadcast(tot))
          .select(col("lang"), col("n_docs"),
            Num.rnd(col("n_docs").cast("double") / col("total").cast("double"), 6)
              .as("share"),
            Num.rnd(col("total").cast("double")
              / (col("k") * col("n_docs")).cast("double"), 6).as("weight"))
      },
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1),
          t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
              CAST(count(*) AS BIGINT) AS k FROM c)
          SELECT c.lang, c.n_docs,
            round(CAST(c.n_docs AS DOUBLE) / CAST(t.total AS DOUBLE) * 1e6) / 1e6 AS share,
            round(CAST(t.total AS DOUBLE) / CAST(t.k * c.n_docs AS DOUBLE) * 1e6) / 1e6 AS weight
          FROM c, t"""))
  )
}
