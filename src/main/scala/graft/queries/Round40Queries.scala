package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num

/** Round-40 additions: item-item collaborative filtering, Markov
  * next-event accuracy, churn feature table.
  */
object Round40Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Item-item collaborative filtering: cosine similarity over the
    // order-part co-occurrence matrix (sim = c_ij / √(c_i·c_j)),
    // top-5 neighbors per part via GroupTopK bounded heaps — the
    // classic recsys neighborhood build, kept linear by the per-order
    // pair expansion (basket-size-bounded, q306's shape).
    "q365_item_item_cf" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val deg = li.groupBy("pk").agg(count(lit(1)).as("c"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("i"), col("y.pk").as("j"))
          .agg(count(lit(1)).as("cij"))
        // symmetrize so every part sees its full neighbor list
        val sym = pairs.unionByName(
          pairs.select(col("j").as("i"), col("i").as("j"), col("cij")))
        val scored = sym
          .join(deg.select(col("pk").as("i"), col("c").as("ci")), Seq("i"))
          .join(deg.select(col("pk").as("j"), col("c").as("cj")), Seq("j"))
          .select(col("i"), col("j"),
            Num.rnd(col("cij").cast("double")
              / sqrt(col("ci").cast("double") * col("cj").cast("double")), 6)
              .as("sim"))
        graft.plans.GroupTopK.topKPerKey(
          scored, Seq("i"), Seq(("sim", true), ("j", false)), 5)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
              FROM lineitem),
          deg AS (SELECT pk, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY 1),
          p AS (SELECT x.pk AS i, y.pk AS j, CAST(count(*) AS BIGINT) AS cij
            FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk GROUP BY 1, 2),
          sym AS (SELECT i, j, cij FROM p
                  UNION ALL SELECT j, i, cij FROM p),
          sc AS (SELECT sym.i, sym.j,
              round(CAST(cij AS DOUBLE)
                / sqrt(CAST(di.c AS DOUBLE) * CAST(dj.c AS DOUBLE)) * 1e6) / 1e6
                AS sim
            FROM sym JOIN deg di ON sym.i = di.pk JOIN deg dj ON sym.j = dj.pk)
          SELECT i, j, sim FROM sc
          QUALIFY row_number() OVER (PARTITION BY i ORDER BY sim DESC, j) <= 5""")),

    // Markov next-event prediction accuracy: the q270 transition
    // matrix's argmax becomes a predictor, evaluated on the SAME
    // consecutive-pair stream — top-1 accuracy overall and per source
    // event.  One lead window + one bounded argmax + one join.
    "q366_markov_accuracy" -> QueryDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("tus"), col("event_id"))
        val pairs = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("tus"), col("event_type").as("src"))
          .withColumn("dst", lead(col("src"), 1).over(w))
          .filter(col("dst").isNotNull)
          .select(col("src"), col("dst"))
        val counts = pairs.groupBy("src", "dst").agg(count(lit(1)).as("c"))
        val aw = org.apache.spark.sql.expressions.Window
          .partitionBy("src").orderBy(col("c").desc, col("dst"))
        val pred = counts.withColumn("rn", row_number().over(aw))
          .filter(col("rn") === 1)
          .select(col("src"), col("dst").as("pred"))
        pairs.join(broadcast(pred), Seq("src"))
          .groupBy("src")
          .agg(count(lit(1)).as("n"),
            sum(when(col("dst") === col("pred"), 1L).otherwise(0L)).as("hits"))
          .select(col("src"), col("n"), col("hits"),
            Num.rnd(col("hits").cast("double") / col("n").cast("double"), 6)
              .as("accuracy"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
              event_type AS src FROM events),
          p0 AS (SELECT src, lead(src) OVER (PARTITION BY user_id
              ORDER BY tus, event_id) AS dst FROM e),
          pairs AS (SELECT src, dst FROM p0 WHERE dst IS NOT NULL),
          counts AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c
            FROM pairs GROUP BY 1, 2),
          pred AS (SELECT src, dst AS pred FROM counts QUALIFY
            row_number() OVER (PARTITION BY src ORDER BY c DESC, dst) = 1)
          SELECT pairs.src, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN pairs.dst = pred.pred THEN 1 ELSE 0 END)
              AS BIGINT) AS hits,
            round(CAST(sum(CASE WHEN pairs.dst = pred.pred THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6) / 1e6 AS accuracy
          FROM pairs JOIN pred ON pairs.src = pred.src GROUP BY 1""")),

    // Churn feature table: per-user behavioral features with a
    // leakage-safe label — activity in the final week labels churn,
    // features come ONLY from the weeks before it (temporal-split
    // discipline, q319).  The feature-store build shape: one filtered
    // grouped pass + one label anti-window.
    "q367_churn_features" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("unix_micros(ts)").as("t"),
            col("event_type"))
        val mx = ev.agg(max(col("t")).as("tmax"))
        val tagged = ev.crossJoin(broadcast(mx))
          .withColumn("cut", col("tmax") - lit(7L * 86400000000L))
        val feat = tagged.filter(col("t") <= col("cut"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(expr("t div 86400000000")).as("days_active"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_purchases"),
            max(col("t")).as("last_t"), max(col("cut")).as("cut"))
        val active = tagged.filter(col("t") > col("cut"))
          .select(col("user_id")).distinct().withColumn("recent", lit(1L))
        feat.join(active, Seq("user_id"), "left")
          .select(col("user_id"), col("n_events"), col("days_active"),
            col("n_purchases"),
            expr("(cut - last_t) div 86400000000").as("days_since_last"),
            (coalesce(col("recent"), lit(0L)) === 0L).cast("long").as("churned"))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_type
            FROM events),
          mx AS (SELECT max(t) - 604800000000 AS cut FROM ev),
          feat AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
              CAST(count(DISTINCT t // 86400000000) AS BIGINT) AS days_active,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
              max(t) AS last_t, max(mx.cut) AS cut
            FROM ev, mx WHERE t <= mx.cut GROUP BY 1),
          act AS (SELECT DISTINCT user_id FROM ev, mx WHERE t > mx.cut)
          SELECT f.user_id, f.n_events, f.days_active, f.n_purchases,
            (f.cut - f.last_t) // 86400000000 AS days_since_last,
            CAST(CASE WHEN act.user_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
              AS churned
          FROM feat f LEFT JOIN act ON f.user_id = act.user_id"""))
  )
}
