package graft.tools

/** Engine-managed staging locations (persisted indexes, stream sources,
  * file sinks, PCM fixtures).
  *
  * Two contracts (ADVICE r12):
  *  - the root is NOT pinned to the repo checkout: override with
  *    `-Dgraft.tmp.dir=...` (or `GRAFT_TMP_DIR`); the default is
  *    `<cwd>/target/tmp`, which matches the historical layout when the
  *    driver runs from the repo root;
  *  - every query stages into its OWN subdirectory (`tag` should embed
  *    the query id when two queries derive the same artifact), so
  *    concurrent execution of two registry entries never races on a
  *    shared overwrite-mode path.
  */
object Staging {
  lazy val root: String =
    sys.props.get("graft.tmp.dir")
      .orElse(sys.env.get("GRAFT_TMP_DIR"))
      .getOrElse(s"${sys.props.getOrElse("user.dir", ".")}/target/tmp")

  /** Per-(tag, data-dir) staging directory, e.g.
    * `dir("gram_index_probe", "/root/testdata/sf0.01")`.
    */
  def dir(tag: String, sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    s"$root/${tag}_$safe"
  }

  /** [[dir]] additionally keyed on the SOURCE table's modification time
    * (r14, VERDICT r13 item 6): persisted fit-once artifacts (q232's MG
    * sketch, q440's NB model) were guarded only by `fs.exists`, so a
    * corpus rewritten in place between runs could silently reuse a stale
    * artifact. Embedding the source file's modTime in the path is the
    * same invalidation key Tables.relCache uses — a changed corpus
    * resolves to a fresh path and refits.
    */
  def dirKeyedOnSource(spark: org.apache.spark.sql.SparkSession,
                       tag: String, sfDir: String, table: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet")
    val mt =
      try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getModificationTime
      catch { case _: java.io.IOException => -1L }
    dir(s"${tag}_mt$mt", sfDir)
  }
}
