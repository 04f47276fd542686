package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** pandas-flavored CSV reader/writer
  * (reference `legate/pandas/frontend/io.py:124-443` option surface;
  * Arrow CSV task `src/io/tasks/read_csv.cc:208`).
  *
  * Options map ~1:1 onto Spark's CSV source, which byte-range-splits
  * files across executors exactly like the reference's per-piece reader —
  * at 100 TB the scan parallelism is the file-split count, no driver
  * bottleneck. Schema is explicit (the reference peeks 3 rows with
  * pandas; we accept a supplied schema or Spark's inferSchema pass).
  */
object CsvPandas {

  final case class ReadOptions(
      sep: String = ",",
      header: Boolean = true,
      names: Seq[String] = Seq(),          // pandas `names=` (no header row)
      schema: Option[StructType] = None,   // pandas `dtype=`
      usecols: Seq[String] = Seq(),        // column projection
      naValues: Seq[String] = Seq(),       // extra NA sentinels
      trueValues: Seq[String] = Seq(),
      falseValues: Seq[String] = Seq(),
      parseDatesFmt: Option[String] = None, // timestampFormat
      quotechar: String = "\"",
      // pandas doublequote=True (RFC4180: "" escapes a quote inside a
      // quoted field — pandas' writer/reader dialect); false = Spark's
      // backslash escaping
      doublequote: Boolean = true,
      // quoted fields may span lines (embedded newlines). SCALE NOTE:
      // multiLine disables byte-range splitting — each FILE becomes one
      // task — so keep it off (default) unless the data needs it, and
      // write many part files when it does.
      multiLine: Boolean = false,
      compression: Option[String] = None,  // gzip/bz2 inferred by extension
      nrows: Option[Int] = None,
      // schema-inference sample size when no schema is given — the
      // reference peeks 3 rows with pandas (frontend/io.py:210-233).
      // <= 0 restores Spark's full-pass inferSchema.
      inferRows: Int = 3)

  /** pandas `dtype=` as a name map — validated eagerly with the
    * reference's error contract (`tests/io/read_csv_errors.py:35-37`):
    * with `names` given, the map must cover EVERY name, and every dtype
    * string must be a known numpy name (graft.Types.sparkTypeOf raises
    * on 'flt'-style typos). Returns the equivalent schema.
    */
  def dtypeSchema(names: Seq[String], dtypes: Map[String, String]): StructType = {
    require(names.nonEmpty, "dtype map requires names")
    val missing = names.filterNot(dtypes.contains)
    require(missing.isEmpty,
      s"dtype map must cover every name; missing: ${missing.mkString(", ")}")
    StructType(names.map(n => org.apache.spark.sql.types.StructField(
      n, graft.Types.sparkTypeOf(dtypes(n)))))
  }

  /** The reference's eager argument checks (read_csv_errors.py): a
    * multi-char `sep` and an empty path list raise at CALL time, not as
    * a downstream parse surprise.
    */
  private def validate(o: ReadOptions): Unit = {
    require(o.sep.length == 1, s"sep must be a single character: '${o.sep}'")
    require(o.quotechar.length == 1, "quotechar must be a single character")
    o.nrows.foreach(n => require(n >= 0, "nrows must be non-negative"))
  }

  /** read_csv with pandas `index_col` (reference
    * `tests/io/read_csv_index.py`): positions (Int) or names (String),
    * in the GIVEN order — `index_col=[1, 0]` yields a MultiIndex whose
    * level 0 is column 1. Returns a GFrame carrying the index contract.
    */
  def readIndexed(spark: SparkSession, path: String, o: ReadOptions,
                  indexCol: Seq[Any]): graft.api.GFrame = {
    val df = read(spark, path, o)
    val cols = df.columns
    val levels = indexCol.map {
      case i: Int =>
        require(i >= 0 && i < cols.length, s"index_col position $i out of range")
        cols(i)
      case n: String =>
        require(cols.contains(n), s"index_col '$n' not in columns")
        n
      case x => throw new IllegalArgumentException(
        s"index_col must be Int or String, got $x")
    }
    graft.api.GFrame(df, levels)
  }

  def read(spark: SparkSession, path: String, o: ReadOptions = ReadOptions()): DataFrame = {
    import org.apache.spark.sql.functions._
    validate(o)
    // pandas true_values/false_values have no Spark CSV equivalent:
    // read boolean target columns as string, map after
    // (reference frontend/io.py true/false_values handling).
    val boolCols: Seq[String] = o.schema match {
      case Some(s) if o.trueValues.nonEmpty || o.falseValues.nonEmpty =>
        s.fields.filter(_.dataType == org.apache.spark.sql.types.BooleanType)
          .map(_.name).toSeq
      case _ => Seq()
    }
    val readSchema = o.schema.map { s =>
      org.apache.spark.sql.types.StructType(s.fields.map(f =>
        if (boolCols.contains(f.name))
          f.copy(dataType = org.apache.spark.sql.types.StringType)
        else f))
    }
    var r = spark.read
      .option("sep", o.sep)
      .option("header", o.header.toString)
      .option("quote", o.quotechar)
      .option("escape", if (o.doublequote) o.quotechar else "\\")
      .option("multiLine", o.multiLine.toString)
    o.naValues.headOption.foreach(v => r = r.option("nullValue", v))
    o.parseDatesFmt.foreach(f => r = r.option("timestampFormat", f))
    readSchema match {
      case Some(s) => r = r.schema(s)
      case None if o.inferRows > 0 =>
        // Peek-inference (reference frontend/io.py:210-233 peeks 3 rows
        // with pandas): infer dtypes from the first few LINES only, then
        // read the data in ONE full pass with the fixed schema. Spark's
        // own inferSchema is a whole extra pass over every byte — real
        // money on 100 TB of CSV. The limit is pushed into the text
        // scan, so the peek reads a single file head, not the dataset.
        r = r.schema(peekSchema(spark, path, o))
      case None => r = r.option("inferSchema", "true")
    }
    var df = r.csv(path)
    // pandas honors EVERY na_values sentinel; Spark's nullValue option takes
    // only one. The first sentinel went through the option (so typed columns
    // parse cleanly); the rest are nulled here on string-typed columns.
    // Non-string columns can't hold a leftover sentinel: under PERMISSIVE
    // parsing an unparseable cell is already null.
    if (o.naValues.size > 1) {
      val rest = o.naValues.tail
      df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.StringType)
        .map(_.name).filterNot(boolCols.contains)
        .foreach { c =>
          df = df.withColumn(c,
            when(col(c).isin(rest: _*), lit(null)).otherwise(col(c)))
        }
    }
    boolCols.foreach { c =>
      df = df.withColumn(c,
        when(col(c).isin(o.trueValues: _*), true)
          .when(col(c).isin(o.falseValues: _*), false)
          .otherwise(col(c).try_cast("boolean")))
    }
    if (o.names.nonEmpty) df = df.toDF(o.names: _*)
    if (o.usecols.nonEmpty) df = df.select(o.usecols.map(col): _*)
    o.nrows.foreach(n => df = df.limit(n))
    df
  }

  /** Schema inference from the first `inferRows` data lines (plus the
    * header line when present) — the bounded-sample analogue of the
    * reference's pandas 3-row peek. Runs Spark's CSV inference over the
    * sampled lines as an in-memory Dataset, so the full files are never
    * scanned for typing.
    */
  def peekSchema(spark: SparkSession, path: String, o: ReadOptions): StructType = {
    import spark.implicits._
    val take = o.inferRows + (if (o.header) 1 else 0)
    val head = spark.read.text(path).limit(take).as[String]
    var r = spark.read
      .option("sep", o.sep)
      .option("header", o.header.toString)
      .option("quote", o.quotechar)
      .option("escape", if (o.doublequote) o.quotechar else "\\")
      .option("inferSchema", "true")
    o.naValues.headOption.foreach(v => r = r.option("nullValue", v))
    o.parseDatesFmt.foreach(f => r = r.option("timestampFormat", f))
    r.csv(head).schema
  }

  /** pandas skiprows/skipfooter (reference `frontend/io.py` options —
    * no Spark CSV equivalent): read as text, drop the first/last lines
    * by global position, then parse with from_csv. skipfooter requires
    * a count (one extra pass), like pandas' python-engine fallback.
    */
  def readSkipRows(spark: SparkSession, path: String,
                   schema: org.apache.spark.sql.types.StructType,
                   skiprows: Int, skipfooter: Int = 0,
                   sep: String = ","): DataFrame = {
    import org.apache.spark.sql.functions._
    val lines = spark.read.text(path)
      .select(col("value"), monotonically_increasing_id().as("__mid"))
    // Global line numbers in __mid order (the text source's in-file
    // order) via the two-phase distributed row number — an
    // un-partitioned row_number().over(orderBy(__mid)) window would
    // funnel the whole file through ONE task, exactly the bottleneck
    // the rest of the engine's scans avoid.
    val numbered = graft.operators.Cumulative.globalRowNumber(
      lines, Seq("__mid"), "__ln1")
    val total = numbered.count()
    numbered
      .filter(col("__ln1") > skiprows && col("__ln1") <= total - skipfooter)
      .select(from_csv(col("value"),
        schema, Map("sep" -> sep)).as("r"))
      .select(col("r.*"))
  }

  /** to_csv (reference `frontend/frame.py:1009-1049`); singleFile ⇔ the
    * reference's repartition-to-1 path (`core/table.py:1134-1182`).
    */
  def write(df: DataFrame, path: String, header: Boolean = true,
            sep: String = ",", singleFile: Boolean = false,
            compression: Option[String] = None,
            naRep: String = "", lineTerminator: Option[String] = None,
            doublequote: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    var w = out.write.mode("overwrite")
      .option("header", header.toString).option("sep", sep)
      // pandas doublequote=True dialect (RFC4180 "" escaping)
      .option("escape", if (doublequote) "\"" else "\\")
    // pandas na_rep / line_terminator (reference frontend/frame.py:1009-1049)
    if (naRep.nonEmpty) w = w.option("nullValue", naRep)
    lineTerminator.foreach(t => w = w.option("lineSep", t))
    compression.foreach(c => w = w.option("compression", c))
    w.csv(path)
  }

  /** Multi-file read (pandas read_csv over a list / glob — the
    * reference reads file lists too, `frontend/io.py:124-443`). Spark
    * byte-range-splits every file in the list across executors.
    */
  def readPaths(spark: SparkSession, paths: Seq[String],
                o: ReadOptions = ReadOptions()): DataFrame = {
    require(paths.nonEmpty, "readPaths requires at least one path")
    paths.map(p => read(spark, p, o)).reduce(_.unionByName(_))
  }
}
