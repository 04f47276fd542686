package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `Series.str` accessor surface
  * (reference `legate/pandas/frontend/accessors.py:80-117`; kernels under
  * `src/string/tasks/`).
  *
  * Everything here is composed from codegen'd builtins — no UDFs — so
  * string pipelines stay inside whole-stage codegen at any scale.
  */
object StringOps {

  /** lower/upper (`src/string/tasks/str_uop.cc:90`). */
  def lower(c: Column): Column = org.apache.spark.sql.functions.lower(c)
  def upper(c: Column): Column = org.apache.spark.sql.functions.upper(c)

  /** swapcase (`src/string/tasks/str_uop.cc` SWAPCASE variant): no Spark
    * builtin. Implemented branch-free over the ASCII range by translating
    * through a paired alphabet; non-ASCII letters pass through unchanged
    * (the reference's CPU kernel is also ASCII-only, `str_uop.cc`).
    */
  private val lowerAlpha = "abcdefghijklmnopqrstuvwxyz"
  private val upperAlpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  def swapcase(c: Column): Column =
    translate(c, lowerAlpha + upperAlpha, upperAlpha + lowerAlpha)

  /** contains(pat, regex=true) (`src/string/tasks/contains.cc:29`). */
  def contains(c: Column, pattern: String, regex: Boolean = true): Column =
    if (regex) c.rlike(pattern) else c.contains(pattern)

  /** pad(width, side, fillchar) (`src/string/tasks/pad.cc:27`). */
  def pad(c: Column, width: Int, side: String, fillchar: String = " "): Column = side match {
    case "left"  => lpad(c, width, fillchar)
    case "right" => rpad(c, width, fillchar)
    case "both"  =>
      // pandas 'both': left gets floor(extra/2), right gets the remainder.
      val extra = greatest(lit(width) - length(c), lit(0))
      val leftN = floor(extra / 2).cast("int")
      rpad(lpad(c, (leftN + length(c)).cast("int"), lit(fillchar)), width, fillchar)
  }

  /** zfill(width) (`src/string/tasks/zfill.cc:27`): zero-pad after any
    * leading sign.
    */
  def zfill(c: Column, width: Int): Column = {
    val sign = substring(c, 1, 1)
    val rest = c.substr(lit(2), length(c))
    // pandas zfill never truncates strings already >= width (lpad would).
    when(length(c) >= width, c)
      .when(sign.isin("-", "+"), concat(sign, lpad(rest, width - 1, "0")))
      .otherwise(lpad(c, width, "0"))
  }

  /** strip(to_strip) (`src/string/tasks/strip.cc:27`). */
  def strip(c: Column, toStrip: Option[String] = None): Column = toStrip match {
    case None    => trim(c)
    case Some(s) => trim(c, s)
  }

  def lstrip(c: Column): Column = ltrim(c)
  def rstrip(c: Column): Column = rtrim(c)

  /** to_datetime with strptime format (`src/string/tasks/to_datetime.cc:314`). */
  def toDatetime(c: Column, fmt: String): Column = Casts.toDatetime(c, fmt)

  // pandas str accessor breadth (each a direct builtin mapping)
  def startswith(c: Column, p: String): Column = c.startsWith(p)
  def endswith(c: Column, p: String): Column = c.endsWith(p)
  def len(c: Column): Column = length(c)
  /** str.slice(start, stop) — 0-based half-open like Python. */
  def slice(c: Column, start: Int, stop: Int): Column =
    substring(c, start + 1, stop - start)
  def repeat(c: Column, n: Int): Column =
    org.apache.spark.sql.functions.repeat(c, n)
  def reverse(c: Column): Column = org.apache.spark.sql.functions.reverse(c)
  /** str.find: 0-based index of first occurrence, -1 if absent. */
  def find(c: Column, sub: String): Column = instr(c, sub) - 1
  /** str.count(pat): non-overlapping literal occurrences. */
  def countMatches(c: Column, sub: String): Column =
    ((length(c) - length(replace(c, lit(sub), lit("")))) / sub.length).cast("int")
}
