package graft.text

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016) — the real
  * merge-table algorithm, not a regex approximation: iteratively merge
  * the most frequent adjacent symbol pair, then encode by applying the
  * learned merges in rank order within each whitespace word.
  *
  * Distributed shape: the merge table is tiny (O(vocab)) and is
  * broadcast; encoding is a pure scan-stage map — zero shuffles at any
  * corpus size, the standard production layout for corpus tokenization
  * (vocab ships to executors once, text never leaves its partition).
  *
  * Cross-engine determinism: [[reprColumn]] expresses the encode as a
  * fold of delimiter-protected string replaces over the representation
  * `(tok)(tok)` (a merge `x y → xy` is `replace("(x)(y)", "(xy)")`).
  * The open/close pair makes this sound under plain
  * leftmost-non-overlapping replace: `(` before x and `)` after y pin
  * both token boundaries, and adjacent occurrences share NO characters
  * (unlike a single-separator form `|x|y|`, whose trailing `|` is the
  * next occurrence's leading `|` — that form cannot merge back-to-back
  * pairs, e.g. `aaaa` with merge (a,a)). For a well-formed merge
  * table — every merge's constituents produced by strictly earlier
  * merges, which [[fit]] guarantees by construction — applying merges
  * in rank order equals the greedy lowest-rank-first encode. The fast
  * [[encodeKernel]] must match it bitwise; BpeSpec pins that over the
  * corpus. Both delimiter chars are stripped from input first (both
  * engines), so the representation is safe on any text.
  *
  * Reference scope: the reference engine stops at whitespace/regex
  * token counting (`src/string/` ops); BPE is part of the
  * training-data-pipeline surface this engine adds.
  */
object Bpe {

  /** Ordered merge list; rank = position. */
  final case class Model(merges: Seq[(String, String)]) {
    require(wellFormed(merges), "merge table is not well-formed BPE")
  }

  /** Every merge's sides must be single chars or products of earlier
    * merges — the property that makes rank-order encode ≡ greedy.
    */
  private def wellFormed(merges: Seq[(String, String)]): Boolean = {
    val made = mutable.Set[String]()
    merges.forall { case (x, y) =>
      val ok = (x.length == 1 || made.contains(x)) &&
        (y.length == 1 || made.contains(y))
      made += (x + y)
      ok
    }
  }

  /** Learn `numMerges` merges from a deterministic sample of the corpus
    * (lowest `idCol` first — reproducible at any parallelism). Training
    * is driver-side over the sample's word-frequency table, the
    * standard practice for tokenizer fitting (the sample is bounded by
    * `sampleDocs`, NOT corpus-sized); encoding afterwards is fully
    * distributed. Ties break on (count desc, pair asc) so the learned
    * table is unique.
    */
  def fit(corpus: DataFrame, idCol: String, textCol: String,
          numMerges: Int, sampleDocs: Int = 1000): Model = {
    val sample = corpus
      .select(col(textCol).cast("string"), col(idCol).as("__id"))
      .orderBy("__id").limit(sampleDocs)
      .collect().map(_.getString(0))
    val wordFreq = mutable.Map[String, Long]().withDefaultValue(0L)
    sample.foreach { t =>
      if (t != null) t.replace("(", "").replace(")", "").split(" ", -1)
        .foreach { w => if (w.nonEmpty) wordFreq(w) += 1L }
    }
    var words: Array[(Array[String], Long)] =
      wordFreq.toArray.sortBy(_._1).map { case (w, f) =>
        (w.map(_.toString).toArray, f)
      }
    val merges = ArrayBuffer[(String, String)]()
    var k = 0
    while (k < numMerges) {
      val pairCount = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      words.foreach { case (toks, f) =>
        var i = 0
        while (i + 1 < toks.length) {
          pairCount((toks(i), toks(i + 1))) += f
          i += 1
        }
      }
      if (pairCount.isEmpty) k = numMerges
      else {
        val best = pairCount.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        if (best._2 < 2) k = numMerges // nothing left worth merging
        else {
          val (x, y) = best._1
          merges += ((x, y))
          words = words.map { case (toks, f) => (mergePass(toks, x, y), f) }
          k += 1
        }
      }
    }
    Model(merges.toSeq)
  }

  /** One leftmost-non-overlapping merge pass over a token array —
    * identical substitution order to String.replace on the delimited
    * representation.
    */
  private def mergePass(toks: Array[String], x: String, y: String): Array[String] = {
    if (toks.length < 2) return toks
    val out = new ArrayBuffer[String](toks.length)
    var j = 0
    while (j < toks.length) {
      if (j + 1 < toks.length && toks(j) == x && toks(j + 1) == y) {
        out += (x + y); j += 2
      } else { out += toks(j); j += 1 }
    }
    out.toArray
  }

  /** Strip both delimiter chars from input text. */
  private def cleanCol(text: Column): Column =
    org.apache.spark.sql.functions.replace(
      org.apache.spark.sql.functions.replace(text, lit("("), lit("")),
      lit(")"), lit(""))

  /** The delimited base representation of `text`: every char c of a
    * word becomes `(c)`, original spaces preserved between words.
    */
  def baseRepr(text: Column): Column =
    regexp_replace(cleanCol(text), "([^ ])", "($1)")

  /** Composed encode: fold the merge table as string replaces over
    * [[baseRepr]] — the oracle-twin formulation (DuckDB runs the
    * character-identical expression).
    */
  def reprColumn(text: Column, model: Model): Column =
    model.merges.foldLeft(baseRepr(text)) { case (r, (x, y)) =>
      org.apache.spark.sql.functions.replace(
        r, lit("(" + x + ")(" + y + ")"), lit("(" + x + y + ")"))
    }

  /** BPE token count for a [[reprColumn]]/kernel representation: one
    * `(` per token.
    */
  def tokenCount(repr: Column): Column =
    (length(repr) -
      length(org.apache.spark.sql.functions.replace(repr, lit("("), lit(""))))
      .cast("long")

  /** Fast distributed encode: split each document into words, apply the
    * merge table in rank order with partition-local tight loops
    * (mapPartitions — the justified imperative kernel: an iterative
    * data-dependent merge loop has no Column form; the composed
    * [[reprColumn]] is its differential twin and must match bitwise).
    * Output: (id, bpe_repr). Merge table ships via closure — tiny,
    * serialized once per task; a 50k-merge production vocab would move
    * to an explicit broadcast + first-token index, same plan shape.
    */
  def encodeKernel(df: DataFrame, idCol: String, textCol: String,
                   model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val merges = model.merges.toArray
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val enc = new PartitionEncoder(merges)
        it.map { case (id, text) =>
          val (repr, nTok) = enc.encode(text)
          (id, repr, nTok)
        }
      }.toDF(idCol, "bpe_repr", "n_tok")
  }

  /** [[encodeKernel]] that KEEPS every input column, appending
    * `bpe_repr` / `n_tok` — for pipelines that need the count next to
    * the document's other attributes (mixing, packing) without a
    * join-back shuffle. Same scan-stage shape, Row-based so the schema
    * passes through.
    */
  def encodeWith(df: DataFrame, textCol: String, model: Model): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType}
    val prepared = df.withColumn(textCol, col(textCol).cast("string"))
    val merges = model.merges.toArray
    val ti = prepared.schema.fieldIndex(textCol)
    val outSchema = prepared.schema
      .add("bpe_repr", StringType).add("n_tok", LongType)
    prepared.mapPartitions { it =>
      val enc = new PartitionEncoder(merges)
      it.map { r =>
        val (repr, nTok) = enc.encode(if (r.isNullAt(ti)) null else r.getString(ti))
        Row.fromSeq(r.toSeq :+ repr :+ nTok)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Partition-local encode state for the kernel paths: the merge loop
    * plus word-level memoization — corpus words follow a Zipf
    * distribution, so most encodes are cache hits (the standard
    * tokenizer trick; GPT-2's encoder caches identically). Cache value =
    * (delimited repr, token count). Bounded: natural-text vocabularies
    * are small relative to a partition; one cache per task.
    */
  private final class PartitionEncoder(merges: Array[(String, String)]) {
    private val cache = new java.util.HashMap[String, (String, Int)]()

    def encode(text: String): (String, Long) = {
      val clean =
        if (text == null) "" else text.replace("(", "").replace(")", "")
      val sb = new StringBuilder
      val words = clean.split(" ", -1)
      var nTok = 0L
      var wi = 0
      while (wi < words.length) {
        if (wi > 0) sb.append(' ')
        val w = words(wi)
        var enc = cache.get(w)
        if (enc == null) {
          var toks = w.map(_.toString).toArray
          var mi = 0
          while (mi < merges.length) {
            if (toks.length > 1) toks = mergePass(toks, merges(mi)._1, merges(mi)._2)
            mi += 1
          }
          val wsb = new StringBuilder
          var ti = 0
          while (ti < toks.length) {
            wsb.append('(').append(toks(ti)).append(')'); ti += 1
          }
          enc = (wsb.toString, toks.length)
          cache.put(w, enc)
        }
        sb.append(enc._1)
        nTok += enc._2
        wi += 1
      }
      (sb.toString, nTok)
    }
  }
}
