package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Column-profiling report (the pandas `describe()`/Deequ-style data
  * quality summary the reference exposes as per-column reductions,
  * e.g. `legate/pandas/frontend/dataframe.py` describe-family
  * reductions): one output row per column with row/null/distinct
  * counts, and min/max/mean as doubles for numeric columns.
  *
  * Scale shape: ONE aggregate pass over the table computes every
  * statistic for every column (count + conditional counts + min/max/
  * avg + count(distinct …) all in a single agg — Catalyst plans the
  * multi-distinct via expand, still one scan of the data), then the
  * 1-row result is unpivoted driver-side into per-column rows: the
  * unpivot touches a single row, never the data. At 100 TB this is
  * exactly one scan, fully partial-aggregatable, no shuffle beyond
  * the count-distinct expand.
  */
object Profile {

  /** Profile `cols` (default: all) of `df`. Output columns:
    * col_name, n_rows, n_nulls, n_distinct, min_d, max_d, mean_d
    * (the *_d stats are null for non-numeric columns).
    *
    * `approxDistinct = true` swaps exact count_distinct for the HLL++
    * sketch (`approx_count_distinct`, rsd 5%): the exact form plans a
    * per-column EXPAND (rows × columns before the partial aggregate),
    * which at 100 TB multiplies the shuffle by the column count — the
    * sketch keeps the scan single-pass with O(columns) state per
    * partition and no expand. The oracle-gated q241 uses the exact
    * form; the sketch path is the production default at scale
    * (error envelope pinned in Round12Spec).
    */
  def report(df: DataFrame, cols: Seq[String] = Nil,
             approxDistinct: Boolean = false): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs = names.flatMap { c =>
      val numeric = types(c).isInstanceOf[NumericType]
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (approxDistinct) approx_count_distinct(col(c), 0.05)
         else count_distinct(col(c))).as(s"${c}__distinct")) ++
      (if (numeric) Seq(
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        graft.functions.Num.rnd(avg(col(c).cast("double")), 6).as(s"${c}__mean"))
       else Nil)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row into per-column rows via a stack —
    // operates on 1 row, so this stage is free at any scale.
    val stacked = names.map { c =>
      val numeric = types(c).isInstanceOf[NumericType]
      struct(
        lit(c).as("col_name"),
        col(s"${c}__rows").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        (if (numeric) col(s"${c}__min") else lit(null).cast("double")).as("min_d"),
        (if (numeric) col(s"${c}__max") else lit(null).cast("double")).as("max_d"),
        (if (numeric) col(s"${c}__mean") else lit(null).cast("double")).as("mean_d"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
