package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num

/** Round-25 additions: data-quality audit ops — referential
  * integrity, functional-dependency discovery, money reconciliation.
  */
object Round25Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Referential-integrity audit across the star schema: orphan
    // counts for three FK relationships, each ONE left-anti hash join
    // (no row ever leaves the executor side) — the first gate of any
    // warehouse-quality report.
    "q310_ref_integrity" -> QueryDef(
      (s, d) => {
        def orphans(fact: org.apache.spark.sql.DataFrame, fk: String,
                    dim: org.apache.spark.sql.DataFrame, pk: String,
                    rel: String) =
          fact.join(dim, fact(fk) === dim(pk), "left_anti")
            .agg(lit(rel).as("relationship"), count(lit(1)).as("n_orphans"))
        orphans(Tables.lineitem(s, d), "l_orderkey",
            Tables.orders(s, d), "o_orderkey", "lineitem->orders")
          .unionByName(orphans(Tables.orders(s, d), "o_custkey",
            Tables.customer(s, d), "c_custkey", "orders->customer"))
          .unionByName(orphans(Tables.customer(s, d), "c_nationkey",
            Tables.nation(s, d), "n_nationkey", "customer->nation"))
      },
      Some("""SELECT 'lineitem->orders' AS relationship,
            CAST(count(*) AS BIGINT) AS n_orphans
          FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
          UNION ALL
          SELECT 'orders->customer',
            CAST(count(*) AS BIGINT)
          FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
          UNION ALL
          SELECT 'customer->nation',
            CAST(count(*) AS BIGINT)
          FROM customer c WHERE NOT EXISTS
            (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)""")),

    // Functional-dependency discovery: for candidate A→B pairs, the
    // violation mass = Σ over A-groups of (rows − rows of the modal B)
    // — 0 means the FD holds exactly.  Two-level aggregate per pair,
    // all exact longs (the profiler's key-discovery primitive).
    "q311_fd_discovery" -> QueryDef(
      (s, d) => {
        def fd(df: org.apache.spark.sql.DataFrame, a: String, b: String,
               label: String) = {
          val g = df.groupBy(col(a).as("av"), col(b).as("bv"))
            .agg(count(lit(1)).as("n"))
          g.groupBy("av").agg(sum(col("n")).as("tot"), max(col("n")).as("mx"))
            .agg(lit(label).as("fd"),
              sum(col("tot") - col("mx")).as("n_violations"),
              count(lit(1)).as("n_groups"))
        }
        val docs = Tables.documents(s, d)
        val ev = Tables.events(s, d)
        fd(docs, "source", "lang", "source->lang")
          .unionByName(fd(docs, "doc_id", "source", "doc_id->source"))
          .unionByName(fd(ev, "user_id", "event_type", "user_id->event_type"))
      },
      Some("""WITH f1 AS (SELECT source AS av, lang AS bv, count(*) AS n
            FROM documents GROUP BY 1, 2),
          a1 AS (SELECT av, sum(n) AS tot, max(n) AS mx FROM f1 GROUP BY 1),
          f2 AS (SELECT doc_id AS av, source AS bv, count(*) AS n
            FROM documents GROUP BY 1, 2),
          a2 AS (SELECT av, sum(n) AS tot, max(n) AS mx FROM f2 GROUP BY 1),
          f3 AS (SELECT user_id AS av, event_type AS bv, count(*) AS n
            FROM events GROUP BY 1, 2),
          a3 AS (SELECT av, sum(n) AS tot, max(n) AS mx FROM f3 GROUP BY 1)
          SELECT 'source->lang' AS fd,
            CAST(sum(tot - mx) AS BIGINT) AS n_violations,
            CAST(count(*) AS BIGINT) AS n_groups FROM a1
          UNION ALL
          SELECT 'doc_id->source', CAST(sum(tot - mx) AS BIGINT),
            CAST(count(*) AS BIGINT) FROM a2
          UNION ALL
          SELECT 'user_id->event_type', CAST(sum(tot - mx) AS BIGINT),
            CAST(count(*) AS BIGINT) FROM a3""")),

    // Money reconciliation: o_totalprice vs the exact DECIMAL revenue
    // sum of the order's lineitems — per-order diff in cents (exact),
    // bucketed into a mismatch report.  The cross-table consistency
    // audit every warehouse runs nightly; decimal discipline means a
    // match/mismatch row can never flip on a shuffle-order ulp.
    "q312_reconciliation" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey").as("ok"))
          .agg(sum(Num.dec2(col("l_extendedprice"))
            * (lit(1) - Num.dec2(col("l_discount")))).as("rev"))
        Tables.orders(s, d)
          .join(li, col("o_orderkey") === col("ok"), "left")
          .select(
            when(col("rev").isNull, lit("no_lineitems"))
              .when(abs(Num.dec2(col("o_totalprice")) - col("rev"))
                <= lit(0.01).cast("decimal(12,4)"), lit("matched"))
              .otherwise(lit("mismatched")).as("status"))
          .groupBy("status").agg(count(lit(1)).as("n_orders"))
      },
      Some("""WITH li AS (SELECT l_orderkey AS ok,
            sum(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS rev
          FROM lineitem GROUP BY 1),
          st AS (SELECT
              CASE WHEN li.rev IS NULL THEN 'no_lineitems'
                   WHEN abs(CAST(o.o_totalprice AS DECIMAL(12,2)) - li.rev)
                     <= CAST(0.01 AS DECIMAL(12,4)) THEN 'matched'
                   ELSE 'mismatched' END AS status
            FROM orders o LEFT JOIN li ON li.ok = o.o_orderkey)
          SELECT status, CAST(count(*) AS BIGINT) AS n_orders
          FROM st GROUP BY 1"""))
  )
}
