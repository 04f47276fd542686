package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dictionary-encoded categorical columns — the pandas `.cat` accessor
  * surface (reference `frontend/accessors.py:32-39`; dictionary build and
  * re-encode `core/column.py:831-911`, dictionary matching at merge time
  * `core/merge.py:281-287`).
  *
  * Spark-first shape: the dictionary is DRIVER-HELD metadata (a pandas
  * `CategoricalDtype`), bounded by category cardinality exactly like the
  * reference's dictionary column; every value↔code operation compiles to
  * a broadcast literal-map lookup (`element_at(typedlit(...))`) that runs
  * inside the scan stage — no shuffle, no join against a dictionary
  * table, codegen-friendly at any corpus size. Category manipulation
  * (rename/add/remove/reorder) is pure dtype arithmetic on the driver;
  * only the final lookup touches data.
  */
final case class CategoricalDtype(categories: IndexedSeq[String],
                                  ordered: Boolean = false) {
  require(categories.distinct.size == categories.size, "categories must be unique")

  private lazy val codeMap: Map[String, Int] = categories.zipWithIndex.toMap

  def codeOf(cat: String): Int =
    codeMap.getOrElse(cat, sys.error(s"'$cat' is not a known category"))

  /** pandas `.cat.codes`: dictionary position, -1 for null/unknown. */
  def codes(c: Column): Column =
    coalesce(element_at(typedlit(codeMap), c), lit(-1)).cast("int")

  /** Values not in the dictionary become null (pandas: NaN on astype
    * with an explicit CategoricalDtype).
    */
  def normalize(c: Column): Column =
    when(element_at(typedlit(codeMap), c).isNotNull, c)

  /** pandas rename_categories(mapping): relabel in place — codes are
    * untouched, the data column maps through the same relabeling.
    */
  def renameCategories(mapping: Map[String, String]): CategoricalDtype =
    copy(categories = categories.map(c => mapping.getOrElse(c, c)))

  def renameColumn(c: Column, mapping: Map[String, String]): Column =
    coalesce(element_at(typedlit(mapping), c), c)

  /** pandas add_categories: append to the END — existing codes stable. */
  def addCategories(newCats: Seq[String]): CategoricalDtype = {
    require(newCats.forall(!codeMap.contains(_)), "category already present")
    copy(categories = categories ++ newCats)
  }

  /** pandas remove_categories: drop from the dictionary (remaining order
    * kept, codes recompacted); data in a removed category becomes null.
    */
  def removeCategories(removals: Seq[String]): CategoricalDtype = {
    removals.foreach(codeOf) // must exist, pandas raises otherwise
    copy(categories = categories.filterNot(removals.contains))
  }

  def removeColumn(c: Column, removals: Seq[String]): Column =
    when(!c.isin(removals.map(x => x: Any): _*), c)

  /** pandas reorder_categories / set_categories: same values, new code
    * assignment (and optionally ordered semantics).
    */
  def reorderCategories(newOrder: Seq[String], ordered: Boolean): CategoricalDtype = {
    require(newOrder.sorted == categories.sorted, "reorder must keep the same category set")
    CategoricalDtype(newOrder.toIndexedSeq, ordered)
  }

  /** Ordered-category comparisons: by dictionary POSITION, not string
    * collation (pandas raises on unordered categoricals; so do we).
    */
  def lt(c: Column, cat: String): Column = cmp(c, cat, _ < _)
  def leq(c: Column, cat: String): Column = cmp(c, cat, _ <= _)
  def gt(c: Column, cat: String): Column = cmp(c, cat, _ > _)
  def geq(c: Column, cat: String): Column = cmp(c, cat, _ >= _)

  private def cmp(c: Column, cat: String, op: (Column, Column) => Column): Column = {
    require(ordered, "comparisons need an ordered categorical (pandas TypeError)")
    val code = element_at(typedlit(codeMap), c) // null for null/unknown → null result
    op(code, lit(codeOf(cat)))
  }
}

object Categorical {

  /** Cap on dictionary cardinality for the driver-side collects
    * ([[infer]], `GFrame.getDummies` discovery). The category contract
    * replicates the dictionary to every executor (the reference does
    * the same, `core/column.py:1134-1249`), so a high-cardinality
    * column used as a categorical is a misuse — this guard turns the
    * silent driver OOM into an immediate, named error. The collect is
    * fetched through sort+limit(cap+1) (TakeOrderedAndProject), so the
    * driver never materializes more than cap+1 rows even on misuse.
    */
  val MaxCategoriesConf = "spark.graft.maxCategories"
  val MaxCategoriesDefault = 65536

  private[graft] def guardedDistinct(df: DataFrame, colName: String,
                                     what: String): IndexedSeq[String] = {
    val max = df.sparkSession.conf
      .get(MaxCategoriesConf, MaxCategoriesDefault.toString).toInt
    val vals = df.select(col(colName).cast("string")).na.drop().distinct()
      .sort(col(colName)).limit(max + 1).collect()
      .map(_.getString(0)).toIndexedSeq
    require(vals.length <= max,
      s"$what on '$colName' found more than $max distinct values; " +
        s"a dictionary that large is replicated to every task — use a " +
        s"join/groupBy instead, or raise $MaxCategoriesConf")
    vals
  }

  /** Infer a dtype from the data: sorted distinct values — the
    * reference's dictionary build (dedup tree + sort,
    * `core/column.py:1134-1249`). A driver collect bounded by
    * [[MaxCategoriesConf]], the same contract as pandas
    * `astype("category")`.
    */
  def infer(df: DataFrame, colName: String): CategoricalDtype = {
    require(df.schema(colName).dataType == org.apache.spark.sql.types.StringType,
      s"categorical inference needs a string column; '$colName' is " +
        s"${df.schema(colName).dataType.simpleString} (cast it first)")
    CategoricalDtype(guardedDistinct(df, colName, "categorical inference"))
  }
}
