package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Round-23 additions: incremental materialized-aggregate maintenance.
  */
object Round23Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Incremental materialized-view maintenance: the per-source
    // (n_docs, total_len) aggregate maintained under q279's
    // DELETE/UPDATE/INSERT changelog by DELTA AGGREGATION — base agg
    // plus signed contributions, never a rescan of the snapshot.
    // Spark computes base ⊎ delta; the ORACLE recomputes the aggregate
    // directly over the applied snapshot, so the gate PROVES
    // base + delta ≡ recompute (the correctness contract of
    // incremental view maintenance).  All contributions are exact
    // longs; at 100 TB this is the only affordable way to keep
    // corpus-level stats current between crawls.
    "q301_incremental_agg" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val base = docs.groupBy("source")
          .agg(count(lit(1)).as("dn"), sum(length(col("text"))).as("dl"))
        // the q279 changelog, as signed delta contributions
        val deletes = docs.filter(col("doc_id") % 7 === 0)
          .select(col("source"), lit(-1L).as("dn"),
            (-length(col("text"))).cast("long").as("dl"))
        val updates = docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 7 =!= 0)
          .select(col("source"), lit(0L).as("dn"),
            (length(concat(col("text"), lit(" v2")))
              - length(col("text"))).cast("long").as("dl"))
        val inserts = docs.filter(col("doc_id") % 11 === 0)
          .select(col("source"), lit(1L).as("dn"),
            length(col("text")).cast("long").as("dl"))
        base.select(col("source"), col("dn"), col("dl"))
          .unionByName(deletes).unionByName(updates).unionByName(inserts)
          .groupBy("source")
          .agg(sum(col("dn")).as("n_docs"), sum(col("dl")).as("total_len"))
      },
      Some("""WITH applied AS (
            SELECT doc_id, source,
              CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
            FROM documents WHERE doc_id % 7 != 0
            UNION ALL
            SELECT doc_id + 1000000, source, text FROM documents
            WHERE doc_id % 11 = 0)
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(length(text)) AS BIGINT) AS total_len
          FROM applied GROUP BY 1""")),

    // §2.12 WEIGHTED PageRank: mass splits proportionally to trade
    // volume (lineitem multiplicity as integer edge weight) —
    // contribution = (pr·w) div sw, same fixed-point replay
    // discipline as q263.
    "q302_weighted_pagerank" -> QueryDef(
      (s, d) => graft.operators.PageRank.runWeighted(
        graft.operators.PageRank.tradeEdgesWeighted(s, d),
        "cust", "supp", "w", iters = 3),
      Some(weightedPrOracleSql)),

    // Event path mining: per-user chronological event-type trigrams
    // (two leads over (ts, event_id)), global top-20 — the sequence-
    // pattern summary beside q270's first-order transitions.
    "q303_path_ngrams" -> QueryDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val t = Tables.events(s, d)
          .select(col("user_id"), col("event_type").as("e0"),
            col("ts"), col("event_id"))
          .withColumn("e1", lead(col("e0"), 1).over(w))
          .withColumn("e2", lead(col("e0"), 2).over(w))
          .filter(col("e1").isNotNull && col("e2").isNotNull)
          .select(concat_ws(">", col("e0"), col("e1"), col("e2")).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
        graft.operators.Sorts.topK(t, Seq("n", "path"), Seq(false, true), 20)
      },
      Some("""WITH t AS (SELECT event_type AS e0,
            lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
            lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2
          FROM events),
          p AS (SELECT e0 || '>' || e1 || '>' || e2 AS path,
              CAST(count(*) AS BIGINT) AS n
            FROM t WHERE e1 IS NOT NULL AND e2 IS NOT NULL GROUP BY 1)
          SELECT path, n FROM p
          QUALIFY row_number() OVER (ORDER BY n DESC, path) <= 20""")),

    // Robust z-score anomaly flags (median/MAD instead of mean/std —
    // immune to the outliers it is hunting): two grouped
    // exact-percentile passes (median, then median absolute
    // deviation) + a broadcast join back; 0.6745·(v−med)/MAD with
    // identical literals on both engines.
    "q304_robust_zscore" -> QueryDef(
      (s, d) => {
        import graft.functions.Num
        val ev = Tables.events(s, d).filter(col("value").isNotNull)
          .select(col("event_id"), col("event_type"), col("value"))
        val med = ev.groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val mad = ev.join(broadcast(med), "event_type")
          .select(col("event_type"), abs(col("value") - col("med")).as("ad"))
          .groupBy("event_type")
          .agg(expr("percentile(ad, 0.5)").as("mad"))
        ev.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
          .select(col("event_id"), col("event_type"),
            (lit(0.6745) * (col("value") - col("med")) / col("mad")).as("rz"))
          .filter(col("rz") > 3.5 || col("rz") < -3.5)
          .select(col("event_id"), col("event_type"),
            Num.rnd(col("rz"), 6).as("rz"))
      },
      Some("""WITH ev AS (SELECT event_id, event_type, value FROM events
            WHERE value IS NOT NULL),
          med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM ev GROUP BY 1),
          mad AS (SELECT ev.event_type,
              quantile_cont(abs(ev.value - med.med), 0.5) AS mad
            FROM ev JOIN med ON ev.event_type = med.event_type GROUP BY 1),
          z AS (SELECT ev.event_id, ev.event_type,
              0.6745 * (ev.value - med.med) / mad.mad AS rz
            FROM ev JOIN med ON ev.event_type = med.event_type
            JOIN mad ON ev.event_type = mad.event_type)
          SELECT event_id, event_type, round(rz * 1e6) / 1e6 AS rz
          FROM z WHERE rz > 3.5 OR rz < -3.5""")),

    // Per-source MinHash vocabulary signatures: 16 md5 min-slots per
    // source (one grouped min-aggregate — constant state), pairwise
    // estimated Jaccard = matching-slot fraction, with q299's exact
    // Jaccard alongside — the sketch-vs-exact exhibit at source
    // granularity (at 100 TB only the signatures are compared; the
    // exact column exists because the oracle can afford it at gate SF).
    "q305_source_minhash" -> QueryDef(
      (s, d) => {
        val sw = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.text.TextStats.tokensNonEmpty(col("text"))).as("w"))
          .distinct()
        val slots = (0 until 16).map(i =>
          min(conv(substring(md5(concat(lit(s"mh$i:"), col("w"))), 1, 15), 16, 10)
            .cast("long")).as(s"h$i"))
        val sig = sw.groupBy("source").agg(slots.head, slots.tail: _*)
        val matches = (0 until 16).map(i =>
          when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
          .reduce(_ + _)
        val est = sig.as("a").join(sig.as("b"),
            col("a.source") < col("b.source"))
          .select(col("a.source").as("s1"), col("b.source").as("s2"),
            (matches.cast("double") / 16.0).as("est_jaccard"))
        val sizes = sw.groupBy("source").agg(count(lit(1)).as("sz"))
        val inter = sw.as("x").join(sw.as("y"),
            col("x.w") === col("y.w") && col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("s1"), col("y.source").as("s2"))
          .agg(count(lit(1)).as("inter"))
        est.join(inter, Seq("s1", "s2"))
          .join(sizes.withColumnRenamed("source", "s1")
            .withColumnRenamed("sz", "n1"), "s1")
          .join(sizes.withColumnRenamed("source", "s2")
            .withColumnRenamed("sz", "n2"), "s2")
          .select(col("s1"), col("s2"), col("est_jaccard"),
            graft.functions.Num.rnd(col("inter").cast("double") /
              (col("n1") + col("n2") - col("inter")).cast("double"), 6)
              .as("exact_jaccard"))
      },
      Some(sourceMinhashOracleSql)),

    // Market-basket pair mining over orders: parts bought together
    // (distinct part pairs per order via a per-key self-join — pair
    // growth is bounded by the per-order basket size, never a corpus
    // cross join), top-20 by support with exact confidence and lift.
    "q306_basket_pairs" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val nOrders = Tables.orders(s, d).agg(count(lit(1)).as("no"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
          .agg(count(lit(1)).as("nab"))
        val singles = li.groupBy(col("pk")).agg(count(lit(1)).as("np"))
        val top = graft.operators.Sorts.topK(pairs,
          Seq("nab", "p1", "p2"), Seq(false, true, true), 20)
        top.join(singles.withColumnRenamed("pk", "p1")
            .withColumnRenamed("np", "n1"), "p1")
          .join(singles.withColumnRenamed("pk", "p2")
            .withColumnRenamed("np", "n2"), "p2")
          .crossJoin(broadcast(nOrders))
          .select(col("p1"), col("p2"), col("nab"),
            graft.functions.Num.rnd(col("nab").cast("double")
              / col("n1").cast("double"), 6).as("confidence"),
            graft.functions.Num.rnd(col("no").cast("double") * col("nab").cast("double")
              / (col("n1").cast("double") * col("n2").cast("double")), 6).as("lift"))
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
          no_ AS (SELECT CAST(count(*) AS BIGINT) AS no FROM orders),
          pairs AS (SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS nab
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY 1, 2),
          singles AS (SELECT pk, CAST(count(*) AS BIGINT) AS np FROM li GROUP BY 1),
          top AS (SELECT p1, p2, nab FROM pairs
            QUALIFY row_number() OVER (ORDER BY nab DESC, p1, p2) <= 20)
          SELECT t.p1, t.p2, t.nab,
            round(CAST(t.nab AS DOUBLE) / CAST(s1.np AS DOUBLE) * 1e6) / 1e6 AS confidence,
            round(CAST(no_.no AS DOUBLE) * CAST(t.nab AS DOUBLE)
              / (CAST(s1.np AS DOUBLE) * CAST(s2.np AS DOUBLE)) * 1e6) / 1e6 AS lift
          FROM top t JOIN singles s1 ON s1.pk = t.p1
          JOIN singles s2 ON s2.pk = t.p2 CROSS JOIN no_"""))
  )

  private def sourceMinhashOracleSql: String = {
    val hCols = (0 until 16).map(i =>
      s"min(CAST(('0x' || substr(md5('mh$i:' || w), 1, 15)) AS BIGINT)) AS h$i")
      .mkString(", ")
    val matches = (0 until 16).map(i =>
      s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH sw AS (SELECT DISTINCT source, unnest(list_filter(
            string_split(text, ' '), x -> x <> '')) AS w FROM documents),
        sig AS (SELECT source, $hCols FROM sw GROUP BY 1),
        est AS (SELECT a.source AS s1, b.source AS s2,
            CAST($matches AS DOUBLE) / 16.0 AS est_jaccard
          FROM sig a JOIN sig b ON a.source < b.source),
        sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM sw GROUP BY 1),
        i AS (SELECT x.source AS s1, y.source AS s2,
            CAST(count(*) AS BIGINT) AS inter
          FROM sw x JOIN sw y ON x.w = y.w AND x.source < y.source
          GROUP BY 1, 2)
        SELECT est.s1, est.s2, est.est_jaccard,
          round(CAST(i.inter AS DOUBLE) /
            CAST(z1.sz + z2.sz - i.inter AS DOUBLE) * 1e6) / 1e6 AS exact_jaccard
        FROM est JOIN i ON i.s1 = est.s1 AND i.s2 = est.s2
        JOIN sz z1 ON z1.source = est.s1 JOIN sz z2 ON z2.source = est.s2"""
  }

  /** q302 oracle: 3 unrolled weighted iterations (`(pr·w) // sw`). */
  private def weightedPrOracleSql: String = {
    val s = graft.operators.PageRank.Scale.toString
    def iter(k: Int, prev: String) =
      s"""m$k AS (SELECT e.dst AS id, sum((p.pr * e.w) // p.sw) AS mass
            FROM e JOIN $prev p ON e.src = p.id GROUP BY 1),
          p$k AS (SELECT v.id, v.sw,
              ((3 * $s) // (20 * nn.n)) + (85 * coalesce(m$k.mass, 0)) // 100 AS pr
            FROM v CROSS JOIN nn LEFT JOIN m$k ON m$k.id = v.id)"""
    s"""WITH e0 AS (SELECT
            'c' || CAST(o_custkey AS VARCHAR) AS src,
            's' || CAST(l_suppkey AS VARCHAR) AS dst,
            CAST(count(*) AS BIGINT) AS w
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1, 2),
        e AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
              SELECT src, dst, w FROM e0
              UNION ALL SELECT dst AS src, src AS dst, w FROM e0)
            GROUP BY 1, 2),
        v AS (SELECT src AS id, CAST(sum(w) AS BIGINT) AS sw FROM e GROUP BY 1),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        p0 AS (SELECT id, sw, ($s // n) AS pr FROM v CROSS JOIN nn),
        ${iter(1, "p0")}, ${iter(2, "p1")}, ${iter(3, "p2")}
        SELECT id, sw, CAST(pr AS BIGINT) AS pr FROM p3"""
  }
}
