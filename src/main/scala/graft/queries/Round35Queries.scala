package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Round-35 additions: perceptual image near-dup (hamming over the
  * real-decode aHash), per-user interval union (activity coverage).
  */
object Round35Queries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // Image near-duplicate pairs: hamming ≤ 4 over the 64-bit
    // real-decode aHash, blocked by the 8 hash BYTES (pigeonhole: any
    // pair within distance 7 shares at least one byte — the q56
    // SimHash chunk discipline applied to image fingerprints), then
    // exact bit_count verify.  Never an all-pairs join.
    "q352_image_neardup" -> QueryDef(
      (s, d) => {
        val h = ImageQueries.ahashes(s, d)
        val chunks = h.select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
          explode(array((0 until 8).map { c =>
            val cv = if (c < 4) expr(s"(ahash_lo >> ${c * 8}) & 255")
                     else expr(s"(ahash_hi >> ${(c - 4) * 8}) & 255")
            struct(lit(c).as("ci"), cv.cast("long").as("cv"))
          }: _*)).as("ch"))
          .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
            col("ch.ci").as("ci"), col("ch.cv").as("cv"))
        val right = chunks.select(col("doc_id").as("d2"),
          col("ahash_hi").as("hi2"), col("ahash_lo").as("lo2"),
          col("ci").as("ci2"), col("cv").as("cv2"))
        val cand = chunks.join(right,
            col("ci") === col("ci2") && col("cv") === col("cv2")
              && col("doc_id") < col("d2"))
          .select(col("doc_id").as("d1"), col("d2"),
            col("ahash_hi").as("hi1"), col("ahash_lo").as("lo1"),
            col("hi2"), col("lo2"))
          .distinct()
        cand.select(col("d1"), col("d2"),
            (expr("bit_count(hi1 ^ hi2)") + expr("bit_count(lo1 ^ lo2)"))
              .cast("long").as("dist"))
          .filter(col("dist") <= 4)
      },
      Some(s"""WITH ${ImageQueries.ahashOracleCtes},
          chunks AS (SELECT doc_id, ahash_hi, ahash_lo, c AS ci,
              CASE WHEN c < 4 THEN (ahash_lo >> (c * 8)) & 255
                   ELSE (ahash_hi >> ((c - 4) * 8)) & 255 END AS cv
            FROM hashes, (SELECT unnest(range(8)) AS c)),
          cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
              a.ahash_hi AS hi1, a.ahash_lo AS lo1,
              b.ahash_hi AS hi2, b.ahash_lo AS lo2
            FROM chunks a JOIN chunks b
              ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
          SELECT d1, d2,
            CAST(bit_count(xor(hi1, hi2)) + bit_count(xor(lo1, lo2)) AS BIGINT)
              AS dist
          FROM cand WHERE bit_count(xor(hi1, hi2)) + bit_count(xor(lo1, lo2)) <= 4""")),

    // Per-user interval union (gaps-and-islands coverage): each event
    // opens a 5-minute activity interval; overlapping intervals merge
    // via the running-max window (user-partitioned — per-user history
    // is bounded), and the output is exact covered time + island
    // count per user.  Integer-µs arithmetic throughout.
    "q353_interval_union" -> QueryDef(
      (s, d) => {
        val iv = Tables.events(s, d)
          .select(col("user_id"), expr("unix_micros(ts)").as("lo"),
            expr("unix_micros(ts) + 300000000").as("hi"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy(col("lo"), col("hi"))
        val prevMax = max(col("hi")).over(
          w.rowsBetween(Window.unboundedPreceding, -1))
        val marked = iv.withColumn("new_island",
          when(prevMax.isNull || col("lo") > prevMax, 1L).otherwise(0L))
        val islands = marked.withColumn("island",
          sum(col("new_island")).over(w))
          .groupBy("user_id", "island")
          .agg(min(col("lo")).as("s"), max(col("hi")).as("e"))
        islands.groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            sum(col("e") - col("s")).as("covered_us"))
      },
      Some("""WITH iv AS (SELECT DISTINCT user_id, epoch_us(ts) AS lo,
              epoch_us(ts) + 300000000 AS hi FROM events),
          m AS (SELECT user_id, lo, hi,
              CASE WHEN max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR lo > max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS new_island
            FROM iv),
          isl AS (SELECT user_id, lo, hi,
              sum(new_island) OVER (PARTITION BY user_id ORDER BY lo, hi
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM m),
          g AS (SELECT user_id, island, min(lo) AS s, max(hi) AS e
            FROM isl GROUP BY 1, 2)
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
            CAST(sum(e - s) AS BIGINT) AS covered_us
          FROM g GROUP BY 1"""))
  )
}
