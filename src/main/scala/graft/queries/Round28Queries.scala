package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num

/** Round-28 additions: triangle counting on the co-purchase graph,
  * edit-distance fuzzy matching, Welch's t-test, one-way ANOVA,
  * CUSUM changepoint detection, per-dimension feature scaling.
  */
object Round28Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // §2.12 triangle counting on the part co-purchase graph (parts
    // sharing an order are connected).  Degree orientation (Cohen
    // 2009 / "MapReduce triangle counting"): orient every undirected
    // edge from the (degree, id)-smaller endpoint, so each triangle
    // has exactly ONE apex with two out-edges and per-node out-degree
    // is O(sqrt E) — the wedge join can never blow up on a celebrity
    // node, which is what makes this the 100 TB-safe formulation
    // (id-orientation leaves hub nodes with million-wide wedge
    // fan-outs; degree orientation caps them).  The oracle counts the
    // same triangles with the naive id-ordered triple join — the
    // count is orientation-invariant.
    "q321_triangle_count" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val und = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("a"), col("y.pk").as("b"))
          .distinct()
        graft.operators.Triangles.count(und)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
              FROM lineitem),
            e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
              FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
            tri AS (SELECT CAST(count(*) AS BIGINT) AS n_tri
              FROM e e1 JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes
              FROM (SELECT a FROM e UNION SELECT b FROM e)),
            ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
          SELECT nn.n_nodes, ne.n_edges, tri.n_tri FROM nn, ne, tri""")),

    // §2.12 edit-distance fuzzy matching (record-linkage style):
    // candidate pairs come from BLOCKING — same noun token + length
    // band ±2 — never an all-pairs cross join; Levenshtein (native,
    // codegen'd in Spark; identical classic unit-cost definition in
    // DuckDB) verifies only inside blocks.  The standard scalable
    // shape: blocks bound the quadratic term, the verify predicate is
    // exact.
    "q322_fuzzy_editdist" -> QueryDef(
      (s, d) => {
        val names = Tables.part(s, d).select("p_name").distinct()
        val keyed = names.select(col("p_name"),
          element_at(split(col("p_name"), " "), 2).as("blk"),
          length(col("p_name")).as("ln"))
        keyed.as("x").join(keyed.as("y"),
            col("x.blk") === col("y.blk")
              && col("x.p_name") < col("y.p_name")
              && abs(col("x.ln") - col("y.ln")) <= 2)
          .select(col("x.p_name").as("n1"), col("y.p_name").as("n2"),
            levenshtein(col("x.p_name"), col("y.p_name")).cast("long").as("dist"))
          .filter(col("dist").between(1, 2))
      },
      Some("""WITH n AS (SELECT DISTINCT p_name FROM part),
            k AS (SELECT p_name, split_part(p_name, ' ', 2) AS blk,
                length(p_name) AS ln FROM n)
          SELECT x.p_name AS n1, y.p_name AS n2,
            CAST(levenshtein(x.p_name, y.p_name) AS BIGINT) AS dist
          FROM k x JOIN k y ON x.blk = y.blk AND x.p_name < y.p_name
            AND abs(x.ln - y.ln) <= 2
          WHERE levenshtein(x.p_name, y.p_name) BETWEEN 1 AND 2""")),

    // Welch's unequal-variance t-test (purchase vs view values): the
    // three moments per group accumulate as EXACT decimals (q277
    // discipline — order-independent under any aggregation tree),
    // then t and the Welch–Satterthwaite dof are the identical double
    // expression on both engines.  One scan, one 2-row aggregate.
    "q323_welch_ttest" -> QueryDef(
      (s, d) => graft.operators.Stats.welchTTest(
        Tables.events(s, d), "event_type", "value", "purchase", "view"),
      Some("""WITH ev AS (SELECT
              CASE WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS g,
              CAST(round(value * 1e6) / 1e6 AS DECIMAL(18,6)) AS vr
            FROM events WHERE event_type IN ('purchase', 'view')),
          m AS (SELECT g, CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(vr) AS DOUBLE) AS sv,
              CAST(sum(vr * vr) AS DOUBLE) AS ss
            FROM ev GROUP BY 1),
          p AS (SELECT
              max(CASE WHEN g = 1 THEN n END) AS n1,
              max(CASE WHEN g = 1 THEN sv END) AS s1,
              max(CASE WHEN g = 1 THEN ss END) AS q1,
              max(CASE WHEN g = 2 THEN n END) AS n2,
              max(CASE WHEN g = 2 THEN sv END) AS s2,
              max(CASE WHEN g = 2 THEN ss END) AS q2
            FROM m),
          v AS (SELECT n1, n2, s1, s2,
              (q1 - s1 * s1 / n1) / (n1 - 1) AS v1,
              (q2 - s2 * s2 / n2) / (n2 - 1) AS v2
            FROM p),
          w AS (SELECT n1, n2, s1, s2, v1, v2,
              v1 / n1 + v2 / n2 AS se2 FROM v)
          SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
            round((s1 / n1 - s2 / n2) * 1e6) / 1e6 AS d_mean,
            round((s1 / n1 - s2 / n2) / sqrt(se2) * 1e6) / 1e6 AS t,
            round(se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
              + (v2 / n2) * (v2 / n2) / (n2 - 1)) * 1e6) / 1e6 AS dof
          FROM w""")),

    // One-way ANOVA F across all event types.  Per-group moments are
    // exact decimals; the only order-sensitive float reduction
    // (Σ s_g²/n_g over the 5 groups) goes through the sorted-list
    // fold (q293 discipline) so both engines add in event_type order.
    // SSB = Σ s_g²/n_g − S²/N, SSW = Σss − Σ s_g²/n_g.
    "q324_anova_f" -> QueryDef(
      (s, d) => graft.operators.Stats.anovaF(
        Tables.events(s, d), "event_type", "value"),
      Some("""WITH ev AS (SELECT event_type,
              CAST(round(value * 1e6) / 1e6 AS DECIMAL(18,6)) AS vr
            FROM events),
          m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              sum(vr) AS sv, sum(vr * vr) AS ss
            FROM ev GROUP BY 1),
          f AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
              CAST(sum(sv) AS DOUBLE) AS sd,
              CAST(sum(ss) AS DOUBLE) AS ssd,
              CAST(count(*) AS BIGINT) AS k,
              list(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                / CAST(n AS DOUBLE) ORDER BY event_type) AS qs
            FROM m),
          b AS (SELECT k, nn, CAST(nn AS DOUBLE) AS nd, sd, ssd,
              list_reduce(qs, (a, x) -> a + x) AS qsum FROM f)
          SELECT k, nn AS n,
            round((qsum - sd * sd / nd) * 1e6) / 1e6 AS ssb,
            round((ssd - qsum) * 1e6) / 1e6 AS ssw,
            round(((qsum - sd * sd / nd) / (CAST(k AS DOUBLE) - 1))
              / ((ssd - qsum) / (nd - CAST(k AS DOUBLE))) * 1e6) / 1e6 AS f
          FROM b""")),

    // CUSUM changepoint detection per event type: series = exact
    // daily value sums; deviation dev_i = n·cum_i − i·T is computed
    // ENTIRELY in integer-scaled decimals (multiply through by n
    // instead of subtracting the float mean), so the argmax is exact
    // and tie-broken by day.  The cumulative sum uses the
    // bounded-domain self-join (≤31 days per type — q298 discipline),
    // never a single-partition global window.
    "q325_cusum_changepoint" -> QueryDef(
      (s, d) => {
        val daily = Tables.events(s, d).select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            Num.rnd(col("value"), 6).cast("decimal(18,6)").as("vr"))
          .groupBy("event_type", "day")
          .agg(sum(col("vr")).cast("decimal(18,6)").as("x"))
        graft.operators.Stats.cusumChangepoint(daily, "event_type", "day", "x")
      },
      Some("""WITH e AS (SELECT event_type,
              epoch_us(ts) // 86400000000 AS day,
              CAST(round(value * 1e6) / 1e6 AS DECIMAL(18,6)) AS vr
            FROM events),
          daily AS (SELECT event_type, day,
              CAST(sum(vr) AS DECIMAL(18,6)) AS x FROM e GROUP BY 1, 2),
          tot AS (SELECT event_type, CAST(sum(x) AS DECIMAL(18,6)) AS tt,
              CAST(count(*) AS DECIMAL(9,0)) AS nd FROM daily GROUP BY 1),
          cum AS (SELECT a.event_type, a.day,
              CAST(sum(b.x) AS DECIMAL(18,6)) AS cum,
              CAST(count(*) AS DECIMAL(9,0)) AS i
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND b.day <= a.day
            GROUP BY 1, 2),
          dev AS (SELECT c.event_type, c.day,
              CAST(c.cum * t.nd - c.i * t.tt AS DECIMAL(24,6)) AS dev
            FROM cum c JOIN tot t ON c.event_type = t.event_type)
          SELECT event_type, CAST(day AS BIGINT) AS cp_day,
            CAST(dev AS DOUBLE) AS dev
          FROM dev
          QUALIFY row_number() OVER (PARTITION BY event_type
            ORDER BY abs(dev) DESC, day) = 1""")),

    // Per-dimension feature scaling (z-score normalization of the
    // embedding space — the fit-then-transform preprocessing stage):
    // fit = one posexplode + 64-row grouped decimal moments;
    // transform = broadcast-join the 64-row stats table back and fold
    // per-vector in pos order (sorted-list fold keeps the Σz² float
    // reduction order-identical on both engines).  Output: per-vector
    // norm of the standardized vector.
    "q326_feature_scaling" -> QueryDef(
      (s, d) => {
        val ex = Tables.embeddings(s, d)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .select(col("vec_id"), col("pos"),
            Num.rnd(col("x").cast("double"), 6).cast("decimal(18,6)").as("xr"))
        val st = ex.groupBy("pos").agg(
            count(lit(1)).cast("double").as("n"),
            sum(col("xr")).cast("double").as("sx"),
            sum(col("xr") * col("xr")).cast("double").as("sxx"))
          .select(col("pos"), (col("sx") / col("n")).as("mu"),
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / col("n"))
              .as("sigma"))
        val z = ex.join(broadcast(st), Seq("pos"))
          .select(col("vec_id"), col("pos"),
            ((col("xr").cast("double") - col("mu")) / col("sigma")).as("zz"))
          .select(col("vec_id"), col("pos"), (col("zz") * col("zz")).as("z2"))
        z.groupBy("vec_id")
          .agg(sort_array(collect_list(struct(col("pos"), col("z2")))).as("zs"))
          .select(col("vec_id"), Num.rnd(sqrt(aggregate(col("zs"), lit(0.0),
            (acc, x) => acc + x.getField("z2"))), 6).as("znorm"))
      },
      Some("""WITH ex AS (SELECT vec_id, gs - 1 AS pos,
              CAST(round(CAST(v AS DOUBLE) * 1e6) / 1e6 AS DECIMAL(18,6)) AS xr
            FROM (SELECT vec_id, unnest(embedding) AS v,
                generate_subscripts(embedding, 1) AS gs FROM embeddings)),
          st AS (SELECT pos, CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(xr) AS DOUBLE) AS sx,
              CAST(sum(xr * xr) AS DOUBLE) AS sxx
            FROM ex GROUP BY 1),
          s2 AS (SELECT pos, sx / n AS mu,
              sqrt((sxx - sx * sx / n) / n) AS sigma FROM st),
          z AS (SELECT e.vec_id, e.pos,
              (CAST(e.xr AS DOUBLE) - s.mu) / s.sigma AS zz
            FROM ex e JOIN s2 s ON e.pos = s.pos),
          l AS (SELECT vec_id, list(zz * zz ORDER BY pos) AS zs
            FROM z GROUP BY 1)
          SELECT vec_id,
            round(sqrt(list_reduce(zs, (a, b) -> a + b)) * 1e6) / 1e6 AS znorm
          FROM l"""))
  )
}
