package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demonstration.
  *
  * @param fn       (session, sfDir) => result DataFrame
  * @param oracle   equivalent ANSI SQL for DuckDB over the same parquet
  *                 tables (None → driver records a weaker rows-only check)
  * @param headline include in the Bench headline set
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
