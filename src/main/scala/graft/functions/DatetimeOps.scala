package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `Series.dt` accessor — datetime field extraction
  * (reference `legate/pandas/frontend/accessors.py:42-77`; fields
  * `legate/pandas/config.py:195-202`; kernel
  * `src/datetime/tasks/extract_field.cc:219`).
  *
  * pandas `weekday` is Monday=0..Sunday=6; Spark's `weekday()` builtin
  * matches exactly (its `dayofweek` is Sunday=1 — do not use it).
  */
object DatetimeOps {
  def year(c: Column): Column = org.apache.spark.sql.functions.year(c)
  def month(c: Column): Column = org.apache.spark.sql.functions.month(c)
  def day(c: Column): Column = dayofmonth(c)
  def hour(c: Column): Column = org.apache.spark.sql.functions.hour(c)
  def minute(c: Column): Column = org.apache.spark.sql.functions.minute(c)
  def second(c: Column): Column = org.apache.spark.sql.functions.second(c)
  def weekday(c: Column): Column = org.apache.spark.sql.functions.weekday(c)
}
