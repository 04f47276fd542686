package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators._
import graft.functions._
import graft.expr.QueryCompiler

/** Element-wise surface: filters, the query() compiler, arithmetic with
  * pandas semantics, null handling, casts, strings, datetimes, cumulative
  * scans. All pure-expression plans (whole-stage codegen, no UDFs).
  */
object ScalarQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // §2.2 boolean-mask filter (COMPACT task analogue).
    "q30_filter_mask" -> QueryDef(
      (s, d) => Projections.filterMask(Tables.lineitem(s, d),
          col("l_quantity") > 30 && col("l_discount") <= 0.05 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), Num.rnd(col("l_extendedprice"), 2).as("price")),
      Some("""SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
             FROM lineitem
             WHERE l_quantity > 30 AND l_discount <= 0.05 AND l_returnflag = 'R'""")),

    // §2.9 query() string → Catalyst expression (replaces numba path,
    // core/query.py:33-312), incl. @ref capture and arithmetic.
    "q31_query_expr" -> QueryDef(
      (s, d) => QueryCompiler.query(Tables.lineitem(s, d),
          "l_quantity > @qmin & l_extendedprice / l_quantity < @punit & l_returnflag == 'A'",
          Map("qmin" -> 30, "punit" -> 1500.0))
        .select(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             WHERE l_quantity > 30 AND l_extendedprice / l_quantity < 1500.0
             AND l_returnflag = 'A'""")),

    // §2.2 loc: scalar index lookup + range slice on the key.
    "q32_loc" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey").between(100, 200))
        .select("l_orderkey", "l_linenumber", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
             WHERE l_orderkey BETWEEN 100 AND 200""")),

    // §2.2 iloc positional slice — deterministic via explicit row order.
    "q33_iloc" -> QueryDef(
      (s, d) => graft.operators.Cumulative
        // two-phase distributed positions — never a single-partition window
        .globalRowNumber(Tables.orders(s, d), Seq("o_orderkey"), "__pos")
        .filter(col("__pos").between(11, 25))
        .select(col("__pos").as("pos"), col("o_orderkey")),
      Some("""SELECT pos, o_orderkey FROM
             (SELECT CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS pos,
                     o_orderkey FROM orders)
             WHERE pos BETWEEN 11 AND 25""")),

    // §2.2 where/mask + scatter assignment (COPY_IF_ELSE / SCATTER_BY_MASK).
    "q34_where_scatter" -> QueryDef(
      (s, d) => {
        val base = Tables.lineitem(s, d)
        val capped = Projections.scatter(base, "l_quantity",
          col("l_quantity") > 30, lit(30.0))
        Projections.where(capped, Seq("l_extendedprice"), col("l_returnflag") === "A")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").as("qty_capped"),
            Num.rnd(col("l_extendedprice"), 2).as("price_masked"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             CASE WHEN l_quantity > 30 THEN 30.0 ELSE l_quantity END AS qty_capped,
             CASE WHEN l_returnflag = 'A' THEN round(l_extendedprice, 2) END AS price_masked
             FROM lineitem""")),

    // §2.8 binary arithmetic with pandas semantics: truediv→double,
    // floordiv, python mod (sign of divisor), pow
    // (src/binaryop/binary_op.h:57-193).
    "q35_arith" -> QueryDef(
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        Num.rnd(PandasArith.truediv(col("l_extendedprice"), col("l_quantity")), 6).as("unit_price"),
        PandasArith.floordiv(col("l_orderkey"), col("l_linenumber")).cast("long").as("fdiv"),
        PandasArith.pymod(negate(col("l_orderkey")), lit(7)).cast("long").as("pmod7"),
        Num.rnd(PandasArith.pow(lit(1.0) + col("l_discount"), lit(2.0)), 6).as("pw"),
        Num.rnd(PandasArith.absCol(col("l_discount") - lit(0.05)), 6).as("absd")),
      Some("""SELECT l_orderkey, l_linenumber,
             round(l_extendedprice / l_quantity, 6) AS unit_price,
             CAST(floor(CAST(l_orderkey AS DOUBLE) / l_linenumber) AS BIGINT) AS fdiv,
             CAST((((-l_orderkey) % 7) + 7) % 7 AS BIGINT) AS pmod7,
             round(pow(1.0 + l_discount, 2.0), 6) AS pw,
             round(abs(l_discount - 0.05), 6) AS absd
             FROM lineitem""")),

    // §2.8 comparisons are non-nullable ops (core/runtime.py:142): null
    // inputs compare false, via a null-producing left join.
    "q36_cmp_null" -> QueryDef(
      (s, d) => Joins.mergeOn(Tables.orders(s, d),
          Tables.customer(s, d).filter(col("c_acctbal") > 5000)
            .select("c_custkey", "c_acctbal"),
          Seq("o_custkey"), Seq("c_custkey"), "left")
        .select(col("o_orderkey"),
          PandasArith.gtNullFalse(col("c_acctbal"), lit(7000)).as("rich"),
          PandasArith.eqNullFalse(col("c_acctbal"), col("c_acctbal")).as("self_eq")),
      Some("""SELECT o_orderkey,
             COALESCE(c_acctbal > 7000, false) AS rich,
             COALESCE(c_acctbal = c_acctbal, false) AS self_eq
             FROM orders LEFT JOIN
             (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000) c
             ON o_custkey = c_custkey""")),

    // §2.8 isna/fillna (BROADCAST_FILLNA) on join-produced nulls.
    "q37_fillna" -> QueryDef(
      (s, d) => {
        val joined = Joins.mergeOn(Tables.orders(s, d),
          Tables.customer(s, d).filter(col("c_acctbal") > 5000)
            .select("c_custkey", "c_name", "c_acctbal"),
          Seq("o_custkey"), Seq("c_custkey"), "left")
        NullOps.fillna(joined, Map(
            "c_name" -> lit("missing"), "c_acctbal" -> lit(0.0)))
          .select(col("o_orderkey"), col("c_name"),
            Num.rnd(col("c_acctbal"), 2).as("bal"),
            PandasArith.isna(col("c_name")).as("was_null"))
      },
      Some("""SELECT o_orderkey, COALESCE(c_name, 'missing') AS c_name,
             round(COALESCE(c_acctbal, 0.0), 2) AS bal,
             COALESCE(c_name, 'missing') IS NULL AS was_null
             FROM orders LEFT JOIN
             (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000) c
             ON o_custkey = c_custkey""")),

    // §2.8 dropna(thresh) (src/copy/tasks/dropna.cc:59 semantics).
    "q38_dropna" -> QueryDef(
      (s, d) => {
        val joined = Joins.mergeOn(Tables.orders(s, d),
          Tables.customer(s, d).filter(col("c_acctbal") > 5000)
            .select("c_custkey", "c_name", "c_acctbal"),
          Seq("o_custkey"), Seq("c_custkey"), "left")
        NullOps.dropnaAny(joined, Seq("c_name", "c_acctbal"))
          .select(col("o_orderkey"), col("c_name"))
      },
      Some("""SELECT o_orderkey, c_name
             FROM orders LEFT JOIN
             (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000) c
             ON o_custkey = c_custkey
             WHERE c_name IS NOT NULL AND c_acctbal IS NOT NULL""")),

    // isna().sum() — per-column null counts.
    "q39_isna_count" -> QueryDef(
      (s, d) => {
        val joined = Joins.mergeOn(Tables.orders(s, d),
          Tables.customer(s, d).filter(col("c_acctbal") > 5000)
            .select("c_custkey", "c_name", "c_acctbal"),
          Seq("o_custkey"), Seq("c_custkey"), "left")
        NullOps.countNa(joined, Seq("c_name", "c_acctbal", "o_orderkey"))
      },
      Some("""SELECT CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_name_nulls,
             CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_acctbal_nulls,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderkey_nulls
             FROM orders LEFT JOIN
             (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000) c
             ON o_custkey = c_custkey""")),

    // §2.8 astype casts: double→int truncates toward zero (numpy/C);
    // DuckDB CAST rounds, so the oracle trunc()s first.
    "q40_astype" -> QueryDef(
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        Casts.astype(col("l_quantity"), "int32").as("qty_int"),
        Casts.astype(col("l_orderkey"), "string").as("ok_str"),
        Casts.astype(col("l_linenumber"), "float64").as("ln_dbl"),
        Casts.astype(Casts.astype(col("l_orderkey"), "string"), "float64").as("parsed_back"),
        Casts.astype(col("l_linenumber"), "int16").as("ln_i16"),
        col("l_shipdate").cast("date").as("ship_date")),
      Some("""SELECT l_orderkey, l_linenumber,
             CAST(trunc(l_quantity) AS INTEGER) AS qty_int,
             CAST(l_orderkey AS VARCHAR) AS ok_str,
             CAST(l_linenumber AS DOUBLE) AS ln_dbl,
             CAST(CAST(l_orderkey AS VARCHAR) AS DOUBLE) AS parsed_back,
             CAST(l_linenumber AS SMALLINT) AS ln_i16,
             CAST(l_shipdate AS DATE) AS ship_date
             FROM lineitem""")),

    // §2.8 string→timestamp round-trip with strptime format
    // (src/string/tasks/to_datetime.cc).
    "q41_to_datetime" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .withColumn("s", date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .select(col("o_orderkey"), col("s").as("date_str"),
          StringOps.toDatetime(col("s"), "%Y-%m-%d").cast("date").as("parsed")),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS date_str,
             CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS parsed
             FROM orders""")),

    // §2.8 string accessor surface (src/string/tasks/*).
    "q42_strings" -> QueryDef(
      (s, d) => Tables.customer(s, d).select(
        col("c_custkey"),
        StringOps.lower(col("c_name")).as("low"),
        StringOps.upper(col("c_mktsegment")).as("up"),
        StringOps.zfill(Casts.astype(col("c_custkey"), "string"), 10).as("zf"),
        StringOps.pad(col("c_mktsegment"), 12, "left", "*").as("padl"),
        StringOps.pad(col("c_mktsegment"), 12, "right", "*").as("padr"),
        StringOps.strip(concat(lit("  "), col("c_name"), lit("  "))).as("stripped"),
        StringOps.contains(col("c_name"), "e.*1").as("has_pat")),
      Some("""SELECT c_custkey,
             lower(c_name) AS low,
             upper(c_mktsegment) AS up,
             lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS zf,
             lpad(c_mktsegment, 12, '*') AS padl,
             rpad(c_mktsegment, 12, '*') AS padr,
             trim('  ' || c_name || '  ') AS stripped,
             regexp_matches(c_name, 'e.*1') AS has_pat
             FROM customer""")),

    // swapcase — translate-based; DuckDB has no builtin, but the same
    // paired-alphabet translate expresses it.
    "q43_swapcase" -> QueryDef(
      (s, d) => Tables.customer(s, d).select(
        col("c_custkey"),
        StringOps.swapcase(concat(col("c_mktsegment"), lit("xY"))).as("sw")),
      Some("""SELECT c_custkey,
             translate(c_mktsegment || 'xY',
               'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ',
               'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz') AS sw
             FROM customer""")),

    // §2.8 datetime fields (EXTRACT_FIELD; pandas weekday = Monday 0).
    "q44_dt_fields" -> QueryDef(
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        DatetimeOps.year(col("o_orderdate")).as("y"),
        DatetimeOps.month(col("o_orderdate")).as("m"),
        DatetimeOps.day(col("o_orderdate")).as("dd"),
        DatetimeOps.weekday(col("o_orderdate")).as("wd")),
      Some("""SELECT o_orderkey,
             CAST(year(o_orderdate) AS INTEGER) AS y,
             CAST(month(o_orderdate) AS INTEGER) AS m,
             CAST(day(o_orderdate) AS INTEGER) AS dd,
             CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd
             FROM orders""")),

    // datetime time-of-day fields on the events table (ns timestamps in
    // parquet; Spark truncates to µs — whole-second fields agree).
    "q45_dt_time" -> QueryDef(
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        DatetimeOps.hour(col("ts")).as("h"),
        DatetimeOps.minute(col("ts")).as("mi"),
        DatetimeOps.second(col("ts")).as("sec")),
      Some("""SELECT event_id,
             CAST(hour(ts) AS INTEGER) AS h,
             CAST(minute(ts) AS INTEGER) AS mi,
             CAST(EXTRACT(second FROM ts) AS INTEGER) AS sec
             FROM events""")),

    // §2.5 GLOBAL cumulative sum — the distributed two-phase scan
    // (Cumulative.globalScan), NOT a single-partition window.
    "q46_cumsum_global" -> QueryDef(
      (s, d) => Cumulative.globalScan(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
            // integer cents: quantity sums stay EXACT in the double
            // accumulator (integers < 2^53), so the running values are
            // order-independent at any scale
            round(col("l_quantity") * 100).cast("long").as("qc"),
            col("l_quantity")),
          // (l_orderkey, l_linenumber) is NOT unique in the corpus; add the
          // value itself as tiebreak so the scan's multiset is deterministic.
          Seq("l_orderkey", "l_linenumber", "l_quantity"), "qc", "cum", Cumulative.SumOp)
        .select(col("l_orderkey"), col("l_linenumber"),
          Num.rnd(col("cum") / 100.0, 2).as("cum_qty")),
      Some("""SELECT l_orderkey, l_linenumber,
             round((sum(CAST(round(l_quantity * 100) AS BIGINT))
               OVER (ORDER BY l_orderkey, l_linenumber, l_quantity
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) / 100.0, 2) AS cum_qty
             FROM lineitem"""),
      headline = true),

    // §2.5 grouped cummax via partitioned window (one hash shuffle).
    "q47_cummax_grouped" -> QueryDef(
      (s, d) => Cumulative.groupedScan(
          Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_extendedprice"),
          Seq("l_orderkey"), Seq("l_linenumber", "l_extendedprice"), "l_extendedprice", "cm", "cummax")
        .select(col("l_orderkey"), col("l_linenumber"), Num.rnd(col("cm"), 2).as("cum_max")),
      Some("""SELECT l_orderkey, l_linenumber,
             round(max(l_extendedprice) OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_max
             FROM lineitem""")),

    // §2.5 grouped cumprod (sign/zero-correct log decomposition).
    "q48_cumprod_grouped" -> QueryDef(
      (s, d) => Cumulative.groupedScan(
          Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_discount"),
          Seq("l_orderkey"), Seq("l_linenumber", "l_discount"), "l_discount", "cp", "cumprod")
        .select(col("l_orderkey"), col("l_linenumber"), Num.rnd(col("cp"), 6).as("cum_prod")),
      Some("""SELECT l_orderkey, l_linenumber,
             round(product(l_discount) OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_discount
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_prod
             FROM lineitem""")),

    // §2.2 column insert + rename + prefix (metadata ops).
    "q49_project_rename" -> QueryDef(
      (s, d) => Projections.addPrefix(
          Projections.rename(
            Projections.withColumn(
              Tables.region(s, d), "key2", col("r_regionkey") * 2),
            Map("r_name" -> "region_name")),
          "x_"),
      Some("""SELECT r_regionkey AS x_r_regionkey, r_name AS x_region_name,
             r_regionkey * 2 AS x_key2 FROM region"""))
  )
}
