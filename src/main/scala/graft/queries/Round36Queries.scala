package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Round-36 additions: exact scalable quantiles via bisection. */
object Round36Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Exact discrete quantiles WITHOUT value buffering
    // (operators/Selection): the price column scaled to integer cents,
    // median and p90 found by value-domain bisection — ~24 codegen'd
    // count passes, O(1) executor state, exact at any scale.  This is
    // the third quantile path beside `percentile` (exact, memory-heavy)
    // and the q271 histogram sketch (bounded, bracketing); the oracle
    // pins the semantics to DuckDB's quantile_disc.
    "q354_bisect_quantiles" -> QueryDef(
      (s, d) => {
        val cents = Tables.lineitem(s, d)
          .select(expr("cast(round(l_extendedprice * 100) as long)").as("c"))
        val med = graft.operators.Selection.quantileDisc(cents, col("c"), 0.5)
        val p90 = graft.operators.Selection.quantileDisc(cents, col("c"), 0.9)
        val n = cents.count()
        import s.implicits._
        Seq((n, med / 100.0, p90 / 100.0)).toDF("n", "median", "p90")
      },
      Some("""WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
            FROM lineitem)
          SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(quantile_disc(c, 0.5) AS DOUBLE) / 100.0 AS median,
            CAST(quantile_disc(c, 0.9) AS DOUBLE) / 100.0 AS p90
          FROM c"""))
  )
}
