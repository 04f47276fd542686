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
}
