package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Token n-gram shingling — the unit of near-duplicate detection.
  *
  * `shingles(text, 3)` produces the distinct set of 3-token windows.
  * Pure array expressions (transform/slice/concat_ws): the shingle set is
  * computed inside the scan stage, never materialized to a shuffle unless
  * an operator downstream needs it.
  */
object Shingles {

  def shingles(text: Column, n: Int): Column = {
    val t = TextStats.tokens(text)
    array_distinct(
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }
}
