package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pandas `df.query(expr)` compiler.
  *
  * The reference parses the expression with Python `ast` and compiles it
  * with numba to a per-row kernel (reference
  * `legate/pandas/core/query.py:33-312`; EVAL_UDF task
  * `src/udf/eval_udf.cc:30`). On Spark none of that machinery is needed:
  * we translate the same grammar straight into a Catalyst `Column`
  * expression, and Tungsten's whole-stage codegen replaces numba — the
  * filter fuses into the scan stage, and comparisons on scan columns are
  * pushed down to parquet.
  *
  * Supported grammar (the reference-tested subset,
  * `tests/pandas/df_query*.py`): identifiers, int/float/string/bool
  * literals, `@name` external references (supplied via `refs`),
  * arithmetic `+ - * / // % **`, comparisons `== != < <= > >=`
  * (including Python chained comparisons `a < b <= c`), boolean `& | ~`
  * (also `and or not`), parentheses.
  *
  * Precedence (loosest→tightest): `|`, `&`, comparisons, `+ -`,
  * `* / // %`, unary `- ~ not`, `**`. Comparisons bind tighter than
  * `&`/`|` — what pandas users mean when they parenthesize for numexpr.
  */
object QueryCompiler {

  sealed private trait Tok
  private case class Ident(s: String) extends Tok
  private case class Ref(s: String) extends Tok
  private case class Num(v: Double, isInt: Boolean) extends Tok
  private case class Str(s: String) extends Tok
  private case class Op(s: String) extends Tok

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    def peek(k: Int) = if (i + k < s.length) s(i + k) else '\u0000'
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val start = i
        while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
          ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
        val text = s.substring(start, i)
        out += Num(text.toDouble, !text.exists(ch => ch == '.' || ch == 'e' || ch == 'E'))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        val w = s.substring(start, i)
        w match {
          case "and" => out += Op("&")
          case "or"  => out += Op("|")
          case "not" => out += Op("~")
          case "in"  => out += Op("in")
          case "True" | "true"   => out += Ident("__true__")
          case "False" | "false" => out += Ident("__false__")
          case _ => out += Ident(w)
        }
      } else if (c == '@') {
        i += 1
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += Ref(s.substring(start, i))
      } else if (c == '\'' || c == '"') {
        val q = c; i += 1
        val start = i
        while (i < s.length && s(i) != q) i += 1
        out += Str(s.substring(start, i)); i += 1
      } else {
        val two = s.substring(i, math.min(i + 2, s.length))
        if (Set("==", "!=", "<=", ">=", "//", "**").contains(two)) { out += Op(two); i += 2 }
        else { out += Op(c.toString); i += 1 }
      }
    }
    out.toList
  }

  private val cmpOps = Set("==", "!=", "<", "<=", ">", ">=")

  def compile(exprStr: String, refs: Map[String, Any] = Map()): Column = {
    var toks = tokenize(exprStr)
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }
    def expectOp(o: String): Unit = next() match {
      case Op(`o`) =>
      case t => throw new IllegalArgumentException(s"expected '$o', got $t in: $exprStr")
    }

    import graft.functions.PandasArith
    def atom(): Column = next() match {
      case Ident("__true__")  => lit(true)
      case Ident("__false__") => lit(false)
      case Ident(name) => col(name)
      case Ref(name) => refs.get(name) match {
        case Some(v) => lit(v)
        case None => throw new IllegalArgumentException(s"unresolved @$name")
      }
      case Num(v, isInt) => if (isInt) lit(v.toLong) else lit(v)
      case Str(v) => lit(v)
      case Op("(") => val e = orExpr(); expectOp(")"); e
      case Op("-") => negate(unary())
      case Op("~") => val e = unary(); !e
      case Op("+") => unary()
      case t => throw new IllegalArgumentException(s"unexpected $t in: $exprStr")
    }
    def unary(): Column = peek match {
      case Some(Op("-")) => next(); negate(unary())
      case Some(Op("~")) => next(); val e = unary(); !e
      case Some(Op("+")) => next(); unary()
      case _ => power()
    }
    def power(): Column = {
      val base = atom()
      peek match {
        case Some(Op("**")) => next(); pow(base, unary()) // right-assoc
        case _ => base
      }
    }
    def mulExpr(): Column = {
      var l = unary()
      var done = false
      while (!done) peek match {
        case Some(Op("*"))  => next(); l = l * unary()
        case Some(Op("/"))  => next(); l = PandasArith.truediv(l, unary())
        case Some(Op("//")) => next(); l = PandasArith.floordiv(l, unary())
        case Some(Op("%"))  => next(); l = PandasArith.pymod(l, unary())
        case _ => done = true
      }
      l
    }
    def addExpr(): Column = {
      var l = mulExpr()
      var done = false
      while (!done) peek match {
        case Some(Op("+")) => next(); l = l + mulExpr()
        case Some(Op("-")) => next(); l = l - mulExpr()
        case _ => done = true
      }
      l
    }
    def cmp1(o: String, l: Column, r: Column): Column = o match {
      case "==" => l === r
      case "!=" => l =!= r
      case "<"  => l < r
      case "<=" => l <= r
      case ">"  => l > r
      case ">=" => l >= r
    }
    // Python chained-comparison semantics: `a < b <= c` means
    // `(a < b) & (b <= c)`, each operand written once — the pandas-ism
    // users type (`core/query.py` compiles the same ast.Compare chain).
    // membership list: `[lit, lit, ...]` or an @ref bound to a Seq —
    // pandas query's `x in [...]` / `x not in @allowed`
    def inListValues(): Seq[Any] = peek match {
      case Some(Ref(name)) =>
        next()
        refs.get(name) match {
          case Some(s: Seq[_])   => s
          case Some(a: Array[_]) => a.toSeq
          case Some(other) =>
            throw new IllegalArgumentException(s"@$name is not a list: $other")
          case None => throw new IllegalArgumentException(s"unresolved @$name")
        }
      case Some(Op("[")) =>
        next()
        val buf = scala.collection.mutable.ListBuffer[Any]()
        var first = true
        while (!peek.contains(Op("]"))) {
          if (!first) expectOp(",")
          first = false
          next() match {
            case Num(v, isInt) => buf += (if (isInt) v.toLong else v)
            case Str(v) => buf += v
            case Op("-") => next() match {
              case Num(v, isInt) => buf += (if (isInt) -v.toLong else -v)
              case t => throw new IllegalArgumentException(s"bad list element $t")
            }
            case t => throw new IllegalArgumentException(s"bad list element $t")
          }
        }
        expectOp("]")
        buf.toList
      case t => throw new IllegalArgumentException(s"expected list after 'in', got $t")
    }
    def cmpExpr(): Column = {
      var prev = addExpr()
      var acc: Option[Column] = None
      var done = false
      while (!done) peek match {
        case Some(Op(o)) if cmpOps.contains(o) =>
          next()
          val r = addExpr()
          val c = cmp1(o, prev, r)
          acc = Some(acc.map(_ && c).getOrElse(c))
          prev = r
        case Some(Op("in")) =>
          next()
          val c = prev.isin(inListValues(): _*)
          acc = Some(acc.map(_ && c).getOrElse(c))
          done = true
        case Some(Op("~")) if toks.drop(1).headOption.contains(Op("in")) =>
          next(); next()
          val c = !prev.isin(inListValues(): _*)
          acc = Some(acc.map(_ && c).getOrElse(c))
          done = true
        case _ => done = true
      }
      acc.getOrElse(prev)
    }
    def andExpr(): Column = {
      var l = cmpExpr()
      while (peek.contains(Op("&"))) { next(); l = l && cmpExpr() }
      l
    }
    def orExpr(): Column = {
      var l = andExpr()
      while (peek.contains(Op("|"))) { next(); l = l || andExpr() }
      l
    }

    val result =
      try orExpr()
      catch {
        case _: NoSuchElementException =>
          throw new IllegalArgumentException(s"unexpected end of expression: $exprStr")
      }
    if (toks.nonEmpty) throw new IllegalArgumentException(s"trailing tokens $toks in: $exprStr")
    result
  }

  /** df.query(expr) → filtered DataFrame. */
  def query(df: org.apache.spark.sql.DataFrame, exprStr: String,
            refs: Map[String, Any] = Map()): org.apache.spark.sql.DataFrame =
    df.filter(compile(exprStr, refs))
}
