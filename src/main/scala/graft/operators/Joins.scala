package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** pandas `merge`/`join` re-expressed on Spark joins.
  *
  * The reference supports equi-joins only, how ∈ {inner,left,outer}
  * (`legate/pandas/config.py:166-169`), with broadcast and partitioned-hash
  * physical variants (`core/merge.py:632-643`). Spark covers both
  * variants natively (autoBroadcastJoinThreshold / `broadcast()` hint vs
  * SortMergeJoin/ShuffledHashJoin) and adds right/semi/anti for free.
  *
  * Output contract matches the reference: row order is NOT preserved
  * (README.md:188), overlapping non-key names are suffixed
  * (`core/merge.py:536-558`), and outer joins coalesce the key columns
  * (`src/merge/merge.cu:148-151` replace_nulls).
  *
  * Scale notes: equi-joins shuffle both sides by the keys — at 100 TB
  * prefer (a) `broadcastHint=true` for dimension tables, (b) bucketed /
  * pre-partitioned inputs so EnsureRequirements elides the exchange,
  * (c) AQE skew-join (on by default here) for hot keys.
  */
object Joins {

  /** pandas merge on same-named key columns.
    * `suffixes` are applied to overlapping non-key columns, pandas-style.
    */
  def merge(left: DataFrame, right: DataFrame, on: Seq[String], how: String,
            suffixes: (String, String) = ("_x", "_y"),
            broadcastRight: Boolean = false): DataFrame = {
    val sparkHow = how match {
      case "outer" => "full_outer"
      case h => h
    }
    val overlap = (left.columns.toSet & right.columns.toSet) -- on.toSet
    val l = overlap.foldLeft(left)((d, c) => d.withColumnRenamed(c, c + suffixes._1))
    val r0 = overlap.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + suffixes._2))
    val r = if (broadcastRight) broadcast(r0) else r0
    // USING-style join: Spark already emits a single coalesced key column
    // for full_outer `Seq(...)` joins — the reference's replace_nulls.
    l.join(r, on, sparkHow)
  }

  /** merge with differently-named keys (left_on / right_on,
    * `frontend/merge.py:20-130` key resolution). The right key columns are
    * dropped from the output like pandas does for equal-valued keys on
    * inner/left; for outer the keys are coalesced.
    */
  /** pandas merge treats null keys as EQUAL (NaN joins NaN) — SQL
    * equality drops them. Null-safe variant via `<=>`, matching the
    * reference's merge-with-nulls tests (tests/pandas/df_merge*nulls).
    */
  def mergeNullSafe(left: DataFrame, right: DataFrame,
                    leftOn: Seq[String], rightOn: Seq[String],
                    how: String): DataFrame = {
    require(leftOn.size == rightOn.size, "left_on/right_on length mismatch")
    val rightRenamed = rightOn.zip(leftOn).foldLeft(right) {
      case (d, (rk, lk)) => d.withColumnRenamed(rk, s"__rk_$lk")
    }
    val cond = leftOn.map(k => left(k) <=> rightRenamed(s"__rk_$k")).reduce(_ && _)
    val joined = left.join(rightRenamed, cond, if (how == "outer") "full_outer" else how)
    leftOn.foldLeft(joined)((d, k) => d.drop(s"__rk_$k"))
  }

  def mergeOn(left: DataFrame, right: DataFrame,
              leftOn: Seq[String], rightOn: Seq[String], how: String): DataFrame = {
    require(leftOn.size == rightOn.size, "left_on/right_on length mismatch")
    val rightRenamed = rightOn.zip(leftOn).foldLeft(right) {
      case (d, (rk, lk)) => d.withColumnRenamed(rk, s"__rk_$lk")
    }
    val cond = leftOn.map(k => left(k) === rightRenamed(s"__rk_$k")).reduce(_ && _)
    val joined = left.join(rightRenamed, cond, if (how == "outer") "full_outer" else how)
    val coalesced =
      if (how == "outer")
        leftOn.foldLeft(joined)((d, k) =>
          d.withColumn(k, coalesce(col(k), col(s"__rk_$k"))))
      else joined
    leftOn.foldLeft(coalesced)((d, k) => d.drop(s"__rk_$k"))
  }
}
