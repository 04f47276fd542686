package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Num
import graft.text.{Fingerprint, Redact}
import graft.multimodal.Multimodal

/** Round-5 surface: the remaining training-data-pipeline operators from
  * the build brief — winnowed document fingerprinting, embedding-cosine
  * near-dup DEDUP (pairs → clusters → representatives), PII redaction,
  * deterministic train/test splitting, and multimodal frame sampling.
  * All oracle-backed; every stochastic-looking step is md5-derived so
  * DuckDB replays it bit-for-bit.
  */
object Round5Queries {

  /** floor(rate · 2^64) as 16 lowercase hex digits (same encoding as
    * q139's mixture sampler).
    */
  private def rateHex(r: Double): String = {
    require(r > 0 && r < 1, "rate in (0,1)")
    val t = (BigDecimal(BigInt(1) << 64) * r).toBigInt
    String.format("%016x", t.bigInteger)
  }

  private val trainHex = rateHex(0.9)

  val defs: Seq[(String, QueryDef)] = Seq(

    // winnowed rolling-hash document fingerprinting (MOSS): min of each
    // 4-window of 8-gram hashes, distinct per doc. Gram hash =
    // md5-top-8-bytes so the oracle recomputes it exactly. Native
    // one-pass WinnowSet expression — zero shuffle; the composed
    // explode+window twin stays spec-pinned (Round5Spec).
    "q145_fingerprint" -> QueryDef(
      (s, d) => Fingerprint.fingerprintsNative(
        Tables.documents(s, d), "doc_id", "text", k = 8, w = 4),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
                         FROM documents WHERE length(text) >= 11),
             pos AS (SELECT doc_id, text, n,
                       unnest(range(1, CAST(n - 6 AS BIGINT))) AS i
                     FROM d),
             g AS (SELECT doc_id, n, i,
                     substr(md5(substr(text, CAST(i AS INT), 8)), 1, 16) AS h
                   FROM pos),
             w AS (SELECT doc_id, n, i,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn
                   FROM g),
             f AS (SELECT doc_id, n, mn FROM w WHERE i <= n - 10)
             SELECT doc_id, CAST(max(n) - 7 AS BIGINT) AS n_grams,
               CAST(count(DISTINCT mn) AS BIGINT) AS n_fps,
               min(mn) AS min_fp, max(mn) AS max_fp
             FROM f GROUP BY 1""")),

    // embedding-cosine near-dup DEDUP: exact tiled pairs at sim ≥ 0.4
    // (the q57 layout — no CartesianProduct), connected components over
    // the pair graph, keep min-id per cluster; singletons keep
    // themselves. `kept` marks the surviving representative set.
    "q146_embed_dedup" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val pairs = graft.similarity.Similarity.cosinePairsTiledKernel(emb, 0.4)
        val comp = graft.operators.Components.connected(pairs, "id1", "id2")
        emb.select(col("vec_id"))
          .join(comp.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("rep"), col("vec_id")).as("rep"),
            (coalesce(col("rep"), col("vec_id")) === col("vec_id")).as("kept"))
      },
      Some {
        val cos = SimilarityQueries.sqlCos("a.embedding", "b.embedding")
        s"""WITH RECURSIVE pairs AS (
              SELECT id1, id2 FROM (
                SELECT a.vec_id AS id1, b.vec_id AS id2,
                  round($cos * 1e6) / 1e6 AS sim
                FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
              WHERE sim >= 0.4),
            edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                      UNION SELECT id2, id1 FROM pairs),
            reach(id, r) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
            comp AS (SELECT id, CAST(min(r) AS BIGINT) AS rep
                     FROM reach GROUP BY 1)
            SELECT v.vec_id, coalesce(c.rep, v.vec_id) AS rep,
              coalesce(c.rep, v.vec_id) = v.vec_id AS kept
            FROM embeddings v LEFT JOIN comp c ON c.id = v.vec_id"""
      }),

    // PII redaction: deterministic e-mail/phone injection derived from
    // doc_id (the corpus is synthetic word-salad), then regex redaction
    // with typed tags + per-type counts. Patterns live in the common
    // Java-regex/RE2 subset so the oracle replays them verbatim.
    "q147_pii_redact" -> QueryDef(
      (s, d) => {
        val t = concat(
          substring(col("text"), 1, 40),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" now"))
        Tables.documents(s, d).select(
          col("doc_id"),
          Redact.pii(t).as("redacted"),
          Redact.emailCount(t).as("n_email"),
          Redact.phoneCount(t).as("n_phone"))
      },
      Some(s"""WITH p AS (SELECT doc_id,
                 substr(text, 1, 40) || ' contact user' ||
                 CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' ||
                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS t
               FROM documents)
             SELECT doc_id,
               regexp_replace(
                 regexp_replace(t, '${Redact.emailPattern}', '<EMAIL>', 'g'),
                 '${Redact.phonePattern}', '<PHONE>', 'g') AS redacted,
               CAST(length(regexp_extract_all(t, '${Redact.emailPattern}')) AS BIGINT) AS n_email,
               CAST(length(regexp_extract_all(t, '${Redact.phonePattern}')) AS BIGINT) AS n_phone
             FROM p""")),

    // deterministic train/test split: md5-uniform draw on doc_id with a
    // salt, 90/10, then per-(split, source) corpus stats — the
    // reproducible split every training pipeline needs (no RNG state,
    // stable under repartitioning and re-runs).
    "q148_train_test_split" -> QueryDef(
      (s, d) => {
        val u = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 16)
        Tables.documents(s, d)
          .withColumn("split", when(u < lit(trainHex), "train").otherwise("test"))
          .groupBy(col("split"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"),
            countDistinct(col("lang")).as("n_langs"))
      },
      Some(s"""SELECT CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 16)
                        < '$trainHex' THEN 'train' ELSE 'test' END AS split,
               source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
             FROM documents GROUP BY 1, 2""")),

    // multimodal frame sampling: fixed 256-byte windows of the binary
    // payload (a video decoder would emit real frames with the same
    // array<binary> shape) — one row per frame with its length and
    // leading byte, byte-verified by the oracle from hex().
    "q149_frame_sample" -> QueryDef(
      (s, d) => Multimodal
        .asBinaryTable(Tables.documents(s, d), "text")
        .select(col("doc_id"),
          posexplode(Multimodal.sampleFrames(col("payload"), 256))
            .as(Seq("frame_idx", "frame")))
        .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
          octet_length(col("frame")).as("frame_len"),
          hex(substring(col("frame"), 1, 1)).as("head_hex")),
      Some("""WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                    octet_length(encode(text)) AS n FROM documents),
             f AS (SELECT doc_id, n, hx,
                     CAST(unnest(range(0, CAST((n - 1) // 256 + 1 AS BIGINT))) AS INT) AS frame_idx
                   FROM h)
             SELECT doc_id, frame_idx,
               CAST(least(256, n - frame_idx * 256) AS INT) AS frame_len,
               substr(hx, frame_idx * 512 + 1, 2) AS head_hex
             FROM f""")),

    // STREAMING MinHash-LSH near-dup — the incremental twin of q55:
    // per-bucket id state in flatMapGroupsWithState, stream-static
    // exact-Jaccard verify. The accumulated pair set equals the batch
    // LSH candidates (microbatch-split independent), and LSH recall vs
    // the exact algorithm is 1.0 at gate SFs (q55's measured bound), so
    // the exact-pair SQL is the oracle here too.
    "q150_stream_neardup" -> QueryDef(
      (s, d) => graft.streaming.DocStreams.nearDupPairs(s, d, n = 3, threshold = 0.5),
      Some(s"WITH ${TextQueries.pairsOracleCtes} SELECT id1, id2, jaccard FROM pairs")),

    // merge_asof direction="nearest" (+tolerance): smallest |Δt| match
    // within the key, ties resolved backward — one shuffle, two
    // partition-local window carries (see AsOfJoin.nearest).
    "q151_asof_nearest" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), unix_micros(col("ts")).as("ctus"))
          .agg(max(col("value")).as("click_value"))
        graft.operators.AsOfJoin.nearest(purchases, clicks, "user_id",
            "tus", "ctus", Seq("click_value"), tolerance = Some(600000000L))
          .select(col("event_id"), col("user_id"),
            Num.rnd(col("click_value"), 6).as("click_value"))
      },
      Some("""WITH clicks AS (
               SELECT user_id, epoch_us(ts) AS ctus, max(value) AS click_value
               FROM events WHERE event_type = 'click' GROUP BY 1, 2)
             SELECT p.event_id, p.user_id,
               round((SELECT c.click_value FROM clicks c
                      WHERE c.user_id = p.user_id
                        AND abs(c.ctus - epoch_us(p.ts)) <= 600000000
                      ORDER BY abs(c.ctus - epoch_us(p.ts)) ASC, c.ctus ASC
                      LIMIT 1), 6) AS click_value
             FROM events p WHERE p.event_type = 'purchase'"""))

    ,

    // sequence PACKING: assign documents to fixed bins round-robin over
    // the (token-count desc, id) order — the distributed LPT-style
    // balancing step before batch construction (equal doc counts, near-
    // equal token sums per bin). Rank via the two-phase distributed row
    // number; everything else is scan-stage.
    "q152_pack_bins" -> QueryDef(
      (s, d) => {
        val nBins = 32
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
        graft.operators.Cumulative.globalRowNumberBy(docs,
            Seq(col("n_tok").desc, col("doc_id").asc), "rn")
          .withColumn("bin", ((col("rn") - 1) % nBins).cast("int"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).cast("long").as("sum_tok"),
            max(col("n_tok")).as("max_tok"),
            min(col("doc_id")).as("first_doc"))
      },
      Some("""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok
                         FROM documents),
             r AS (SELECT doc_id, n_tok,
                     row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rn
                   FROM t)
             SELECT CAST((rn - 1) % 32 AS INT) AS bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS sum_tok,
               CAST(max(n_tok) AS INT) AS max_tok,
               min(doc_id) AS first_doc
             FROM r GROUP BY 1""")),

    // model-based quality scoring: corpus unigram LM (token → frequency),
    // each document scored by its mean token log-probability — the
    // KenLM-style perplexity filter of curation pipelines, distilled to
    // the unigram case. Vocab is a bounded aggregate (≪ corpus) joined
    // back broadcast; per-token logprobs are rounded to 6dp BEFORE the
    // exact DECIMAL sum so 1-ulp ln() differences between engines can't
    // flip the rounded mean (the Num.sumMoney discipline, applied to
    // logs).
    "q153_unigram_quality" -> QueryDef(
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        val withTotal = vocab.crossJoin(
          broadcast(vocab.agg(sum(col("cnt")).as("__total"))))
        val scored = toks
          .join(broadcast(withTotal), "tok")
          .withColumn("lp", Num.rnd(
            log(col("cnt").cast("double") / col("__total").cast("double")), 6))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"),
            sum(col("lp").cast("decimal(18,6)")).as("__sum"))
        scored.select(col("doc_id"), col("n_tok"),
          Num.rnd(col("__sum").cast("double") / col("n_tok"), 6).as("avg_lp"))
      },
      Some("""WITH toks AS (
               SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                 x -> x <> '')) AS tok
               FROM documents),
             vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
                       FROM toks GROUP BY 1),
             tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
             lp AS (SELECT t.doc_id,
                      CAST(round(ln(CAST(v.cnt AS DOUBLE) / CAST(tot.total AS DOUBLE)), 6)
                        AS DECIMAL(18,6)) AS lp
                    FROM toks t JOIN vocab v ON t.tok = v.tok, tot)
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
               round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_lp
             FROM lp GROUP BY 1""")),

    // KMV (k-minimum-values) distinct-count sketch, per group — the
    // mergeable approximate-nunique of large-scale profiling, built on a
    // DETERMINISTIC md5 hash so the oracle recomputes the sketch (and
    // its estimate) exactly: dedup hashes, keep the k smallest per group
    // (the custom GroupTopK bounded-heap operator — never a full sort),
    // estimate (k−1)/u_k from the kth normalized hash. Exact nunique
    // rides along for the error check; the spec asserts the estimate's
    // relative error. Estimate = count when a group has < k distinct.
    "q154_kmv_distinct" -> QueryDef(
      (s, d) => {
        val k = 64
        val hashed = Tables.events(s, d)
          .select(col("event_type"),
            substring(md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 12).as("h"))
          .distinct()
        val kmin = graft.plans.GroupTopK.topKPerKey(
          hashed, Seq("event_type"), Seq(("h", false)), k)
        val sketch = kmin.groupBy("event_type")
          .agg(count(lit(1)).as("n_h"), max(col("h")).as("mx"))
          .withColumn("est", Num.rnd(
            when(col("n_h") < k, col("n_h").cast("double"))
              .otherwise(lit((k - 1).toDouble) /
                (conv(col("mx"), 16, 10).cast("double") / math.pow(16.0, 12))), 3))
        val exact = Tables.events(s, d).groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("exact"))
        sketch.join(exact, "event_type")
          .select(col("event_type"), col("n_h"), col("est"), col("exact"))
      },
      Some("""WITH d AS (SELECT DISTINCT event_type,
                 substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12) AS h
               FROM events),
             r AS (SELECT event_type, h,
                     row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
                   FROM d),
             s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_h, max(h) AS mx
                   FROM r WHERE rn <= 64 GROUP BY 1),
             e AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact
                   FROM events GROUP BY 1)
             SELECT s.event_type, n_h,
               round(CASE WHEN n_h < 64 THEN CAST(n_h AS DOUBLE)
                 ELSE 63.0 / (CAST(CAST('0x' || mx AS BIGINT) AS DOUBLE) / power(16, 12))
                 END, 3) AS est,
               exact
             FROM s JOIN e ON s.event_type = e.event_type""")),

    // multimodal RESIZE stub: stride-resample every payload to a fixed
    // 64 bytes (out[j] = in[floor(j·n/64)]) — scan-stage binary→binary,
    // the column shape a real image resize keeps. Result pinned as the
    // hex string of the resampled bytes, byte-verified by the oracle.
    "q155_resize" -> QueryDef(
      (s, d) => Multimodal.asBinaryTable(Tables.documents(s, d), "text")
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          array_join(transform(
            Multimodal.resizeBytes(col("payload"), 64), b => hex(b)), "").as("resized_hex")),
      Some("""WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                    octet_length(encode(text)) AS n FROM documents)
             SELECT doc_id, CAST(n AS INT) AS n_bytes,
               array_to_string(list_transform(range(64),
                 j -> substr(hx, CAST(2 * ((j * n) // 64) + 1 AS INT), 2)), '') AS resized_hex
             FROM h""")),

    // merge_asof(allow_exact_matches=False): strict `<` backward match
    // through the pandas-style GFrame API. Clicks AT the purchase
    // timestamp must not match — only strictly earlier ones.
    "q156_asof_strict" -> QueryDef(
      (s, d) => {
        import graft.api.GFrame
        val ev = Tables.events(s, d)
        val purchases = GFrame(ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus")))
        val clicks = GFrame(ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), unix_micros(col("ts")).as("ctus"))
          .agg(max(col("value")).as("click_value")))
        purchases.mergeAsof(clicks, "user_id", "tus", "ctus",
            Seq("click_value"), direction = "backward",
            allowExactMatches = false)
          .df.select(col("event_id"), col("user_id"),
            Num.rnd(col("click_value"), 6).as("click_value"))
      },
      Some("""WITH clicks AS (
               SELECT user_id, epoch_us(ts) AS ctus, max(value) AS click_value
               FROM events WHERE event_type = 'click' GROUP BY 1, 2)
             SELECT p.event_id, p.user_id,
               round((SELECT c.click_value FROM clicks c
                      WHERE c.user_id = p.user_id
                        AND c.ctus < epoch_us(p.ts)
                      ORDER BY c.ctus DESC LIMIT 1), 6) AS click_value
             FROM events p WHERE p.event_type = 'purchase'"""))

    ,

    // per-group Pearson correlation + covariance from EXACT decimal
    // sums: built-in corr()/covar use Welford-style merges whose float
    // results depend on partitioning and engine; accumulating Σx, Σy,
    // Σxy, Σx², Σy² as DECIMAL makes the moments exact and identical in
    // both engines, so the final double formula hash-matches. The
    // decimal sums are plain partial-aggregatable SUMs — same shuffle
    // shape as the native corr.
    "q157_corr" -> QueryDef(
      (s, d) => {
        val x = col("l_quantity").cast("decimal(12,2)")
        val y = col("l_extendedprice").cast("decimal(12,2)")
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum(x * y).cast("decimal(38,4)").as("sxy"),
            sum(x * x).cast("decimal(38,4)").as("sxx"),
            sum(y * y).cast("decimal(38,4)").as("syy"))
          .select(col("l_returnflag"), col("n"),
            Num.rnd((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * (col("n") - 1)).cast("double"), 4).as("cov_samp"),
            Num.rnd((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                   (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
              .as("pearson"))
      },
      Some("""WITH m AS (SELECT l_returnflag,
                 CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
                 sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
                 CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) *
                          CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS sxy,
                 CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) *
                          CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS sxx,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                          CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS syy
               FROM lineitem GROUP BY 1)
             SELECT l_returnflag, n,
               round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 4) + 0 AS cov_samp,
               round(CAST(n * sxy - sx * sy AS DOUBLE) /
                 sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                      CAST(n * syy - sy * sy AS DOUBLE)), 6) + 0 AS pearson
             FROM m""")),

    // pandas sample(n=) with a fixed seed: EXACTLY n rows, drawn by
    // md5-hash order — deterministic across engines, partitionings and
    // re-runs, and plan-wise just TakeOrderedAndProject (bounded heaps
    // per partition, no global sort, no window).
    "q158_sample_n" -> QueryDef(
      (s, d) => graft.operators.Sorts.topK(
          Tables.documents(s, d)
            .withColumn("__u", md5(concat(lit("sample:"), col("doc_id").cast("string")))),
          Seq("__u"), Seq(true), 100)
        .select(col("doc_id"), col("source"), col("lang")),
      Some("""SELECT doc_id, source, lang FROM documents
             QUALIFY row_number() OVER (
               ORDER BY md5('sample:' || CAST(doc_id AS VARCHAR))) <= 100"""))
  )
}
