package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Round-45 additions (build round 12): oracle gates for the two
  * remaining VERDICT r11 "missing" items —
  *
  *  - the frame-metadata-op cluster (droplevel / swaplevel / iat /
  *    set_axis / squeeze / copy / add_suffix) plus join-on-index, which
  *    until now were ScalaTest-only (reference
  *    `tests/pandas/df_droplevel.py`, `df_set_axis.py`, `df_iat.py`,
  *    `df_join.py`);
  *  - the datetime64[ns] precision contract: the reference stores
  *    nanosecond int64 (`legate/pandas/common/types.py:112-121`), the
  *    engine's TimestampType is µs — q396 pins the divergence exactly
  *    (floor-truncation of the sub-µs residue) through a LongType-ns
  *    round trip, so the one dtype-lattice hole is a measured contract,
  *    not an undocumented loss.
  */
object Round45Queries {

  /** floor(rate · 2^64) as 16 lowercase hex digits (q148's encoding). */
  private def rateHex(r: Double): String = {
    require(r > 0 && r < 1, "rate in (0,1)")
    val t = (BigDecimal(BigInt(1) << 64) * r).toBigInt
    String.format("%016x", t.bigInteger)
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // Composite metadata-op pipeline. One flow exercises every op with
    // an observable effect: two iat() reads pin the MultiIndex sort
    // order BEFORE and AFTER swaplevel (different offset-3 rows);
    // droplevel removes the region level so the index-join is single-
    // key; the right frame goes through set_axis (positional rename —
    // its "n_cust" name survives to the output), copy (identity) and
    // squeeze (single-data-column view); join(right) joins ON INDEX
    // (left n_nationkey vs right nkey, right key dropped, pandas
    // df.join semantics); add_suffix stamps every output column.
    "q395_frame_metadata" -> QueryDef(
      (s, d) => {
        import graft.api.GFrame
        val nf0 = GFrame(
          Tables.nation(s, d).select("n_regionkey", "n_nationkey", "n_name"),
          Seq("n_regionkey", "n_nationkey"))
        val iatA = nf0.iat(3, "n_name").get.toString // (region, nation) order
        val nf1 = nf0.swaplevel() // index now (n_nationkey, n_regionkey)
        val iatB = nf1.iat(3, "n_name").get.toString // (nation, region) order
        val nf2 = nf1.droplevel(1) // drop n_regionkey → single-level index
        val cf = GFrame(
          Tables.customer(s, d).groupBy("c_nationkey")
            .agg(count(lit(1)).as("cnt")),
          Seq("c_nationkey"))
          .setAxis(Seq("nkey", "n_cust"))
          .copy()
          .squeeze()
        nf2.join(cf, "left")
          .assign("iat_a", lit(iatA))
          .assign("iat_b", lit(iatB))
          .addSuffix("_f")
          .df
      },
      Some(
        """WITH cf AS (SELECT c_nationkey AS nkey,
              CAST(count(*) AS BIGINT) AS n_cust
            FROM customer GROUP BY 1)
          SELECT n.n_nationkey AS n_nationkey_f, n.n_name AS n_name_f,
            cf.n_cust AS n_cust_f,
            (SELECT n_name FROM nation ORDER BY n_regionkey, n_nationkey
              OFFSET 3 LIMIT 1) AS iat_a_f,
            (SELECT n_name FROM nation ORDER BY n_nationkey, n_regionkey
              OFFSET 3 LIMIT 1) AS iat_b_f
          FROM nation n LEFT JOIN cf ON n.n_nationkey = cf.nkey""")),

    // datetime64[ns] precision gate: synthesize genuine sub-µs values
    // (event_id·137 mod 1000 ns past each event's µs timestamp — the
    // corpus itself is µs), hold them in the reference's own storage
    // representation (int64 ns), convert to the engine's TimestampType
    // and back. Pins: ts_us = floor(ns/1000) µs exactly; the round trip
    // loses exactly lost_ns = ns mod 1000 ∈ [0, 1000); calendar
    // accessors (dt.year here) agree with the ns value they truncate
    // from. This is the explicit-divergence alternative of VERDICT r11
    // item 5: µs truncation is the documented COVERAGE.md contract, and
    // ns-exact arithmetic stays available on the LongType twin.
    "q396_ns_roundtrip" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("event_id") % 7 === 0)
        ev.select(col("event_id"),
            (unix_micros(col("ts")) * 1000 +
              pmod(col("event_id") * 137, lit(1000))).as("ns"))
          // FLOOR division, not `div` (truncate-toward-zero): for a
          // pre-1970 timestamp ns is negative and -1500 div 1000 = -1
          // where the truncation contract floors to -2. Exact in int64
          // space: subtract pmod(ns,1000) ∈ [0,1000) first. (DuckDB's
          // `//` ALSO truncates toward zero — measured: -5 // 3 = -1 —
          // so the oracle applies the same subtract-nonneg-mod form
          // rather than a bare `//`.)
          .select(col("event_id"), col("ns"),
            timestamp_micros(expr("(ns - pmod(ns, 1000)) div 1000")).as("ts_us"))
          .select(col("event_id"), col("ns"), col("ts_us"),
            (unix_micros(col("ts_us")) * 1000).as("ns_back"),
            (col("ns") - unix_micros(col("ts_us")) * 1000).as("lost_ns"),
            year(col("ts_us")).cast("long").as("yr"))
      },
      Some(
        """WITH ns_tbl AS (SELECT event_id,
              epoch_us(ts) * 1000 + (event_id * 137) % 1000 AS ns
            FROM events WHERE event_id % 7 = 0),
          us_tbl AS (SELECT event_id, ns,
              (ns - ((ns % 1000) + 1000) % 1000) // 1000 AS us
            FROM ns_tbl)
          SELECT event_id, ns,
            make_timestamp(us) AS ts_us,
            us * 1000 AS ns_back,
            ns - us * 1000 AS lost_ns,
            CAST(year(make_timestamp(us)) AS BIGINT) AS yr
          FROM us_tbl""")),

    // File-sink streaming twin (VERDICT r11 item 7): the q137 curation
    // stream re-gated through a foreachBatch parquet sink + read-back
    // instead of the driver-bound memory sink — same transform, same
    // oracle, executor-side distributed writes (the streaming-
    // materialized-view shape a production deployment uses).
    "q397_stream_curation_file" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.curateToFiles(s, d, minQuality = 0.5),
      Some(s"""SELECT ${TextQueries.fingerprintSql} AS fp,
             min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n
             FROM documents
             WHERE round(${TextQueries.qualitySql}, 6) >= 0.5
             GROUP BY 1""")),

    // Leakage-safe DECONTAMINATED train/eval split: hash-split the
    // corpus (q148's deterministic md5 u64 draw, 90/10), find verified
    // near-duplicate pairs (the q55 MinHash-LSH banding — bounded
    // buckets, exact Jaccard verify), and QUARANTINE every train doc
    // that near-duplicates an eval doc ('leak' tier) so eval never
    // scores memorized training text. This is the split a real
    // pretraining pipeline ships: dedup alone can't do it (the dup may
    // straddle the split boundary) and a plain hash split leaks.
    // Scale shape: the pair set comes from banded LSH (never all
    // pairs); the leaked-id set is a doc_id semi-join, broadcastable
    // by construction (≤ dup-pair count). Oracle replays the split
    // arithmetic and the EXACT Jaccard pair set (LSH recall vs exact
    // is 1.0 at t=0.5 on this corpus — the q55 gate pins that).
    "q398_decontaminated_split" -> QueryDef(
      (s, d) => {
        val trainHex = rateHex(0.9)
        val docs = Tables.documents(s, d)
        val u = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 16)
        val tagged = docs.select(col("doc_id"), col("source"), col("n_chars"),
          when(u < lit(trainHex), "train").otherwise("eval").as("split0"))
        val pairs = graft.text.MinHash
          .nearDuplicates(docs, "doc_id", "text", n = 3, threshold = 0.5)
          .select("id1", "id2")
        val sym = pairs.unionByName(
          pairs.select(col("id2").as("id1"), col("id1").as("id2")))
        val splits = tagged.select(col("doc_id"), col("split0"))
        val leaked = sym
          .join(splits.select(col("doc_id").as("id1"), col("split0").as("s1")), "id1")
          .join(splits.select(col("doc_id").as("id2"), col("split0").as("s2")), "id2")
          .filter(col("s1") === "train" && col("s2") === "eval")
          .select(col("id1").as("doc_id")).distinct()
        tagged
          .join(broadcast(leaked.withColumn("leak", lit(true))), Seq("doc_id"), "left")
          .withColumn("split",
            when(col("split0") === "train" && col("leak"), "leak")
              .otherwise(col("split0")))
          .groupBy("split", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
      },
      Some(s"""WITH ${TextQueries.pairsOracleCtesAt("0.5")},
             sp AS (SELECT doc_id, source, n_chars,
                 CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 16)
                      < '${rateHex(0.9)}' THEN 'train' ELSE 'eval' END AS split0
               FROM documents),
             sym AS (SELECT id1, id2 FROM pairs
                     UNION ALL SELECT id2 AS id1, id1 AS id2 FROM pairs),
             leaked AS (SELECT DISTINCT a.id1 AS doc_id
               FROM sym a JOIN sp t ON a.id1 = t.doc_id
                          JOIN sp e ON a.id2 = e.doc_id
               WHERE t.split0 = 'train' AND e.split0 = 'eval'),
             fin AS (SELECT CASE WHEN sp.split0 = 'train' AND l.doc_id IS NOT NULL
                       THEN 'leak' ELSE sp.split0 END AS split, source, n_chars
                     FROM sp LEFT JOIN leaked l ON sp.doc_id = l.doc_id)
             SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
             FROM fin GROUP BY 1, 2"""))
  )
}
