package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The riemann index-query language, compiled to Catalyst `Column`
  * predicates instead of eval'd closures.
  *
  * Grammar from reference resources/query.g4:1-145: boolean
  * `and`/`or`/`not` over primaries `tagged "s"`, `value (= != < > <= >=)
  * value` (inequality RHS must be numeric), `value =~ "pat%"` (anchored
  * LIKE, `%` = wildcard), `value ~= "regex"` (unanchored find), bare
  * field truthiness. Values: true/false/nil/null, longs, floats (incl.
  * Infinity/NaN), bigints (`123N`), strings, field names. AST shape
  * mirrors reference src/riemann/query.clj:64-118; compile semantics
  * mirror src/riemann/query.clj:124-191 (numeric-guarded comparisons,
  * `make-regex` LIKE translation, `tagged` membership).
  *
  * Divergence (documented): the reference uses Clojure `=` where
  * `(= 2 2.0)` is false; we compare numerically with try-cast semantics
  * (string attribute "2" equals 2), which is the natural typed-relational
  * reading. The reference's eval+LRU-cache (query.clj:193-216) is
  * subsumed by Catalyst codegen + plan caching.
  */
object QueryLanguage {

  // ---------------------------------------------------------------- AST
  sealed trait Ast
  case class BoolLit(v: Boolean) extends Ast
  case object NullLit extends Ast
  case class LongLit(v: Long) extends Ast
  case class DoubleLit(v: Double) extends Ast
  case class BigLit(v: BigDecimal) extends Ast
  case class StrLit(v: String) extends Ast
  case class FieldRef(name: String) extends Ast
  case class Cmp(op: String, l: Ast, r: Ast) extends Ast // = != < > <= >=
  case class LikeMatch(target: Ast, pattern: String) extends Ast
  case class RegexMatch(target: Ast, pattern: String) extends Ast
  case class Tagged(tag: String) extends Ast
  case class Not(p: Ast) extends Ast
  case class And(l: Ast, r: Ast) extends Ast
  case class Or(l: Ast, r: Ast) extends Ast

  case class ParseException(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------------- Lexer
  private sealed trait Tok
  private case class TName(s: String) extends Tok
  private case class TStr(s: String) extends Tok
  private case class TLong(v: Long) extends Tok
  private case class TDouble(v: Double) extends Tok
  private case class TBig(v: BigDecimal) extends Tok
  private case class TSym(s: String) extends Tok // ( ) = != < > <= >= =~ ~=

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    val n = s.length
    def isNameHead(c: Char) =
      !c.isDigit && !"^`'\"#~@:/%()[]{} \n\r\t,=<>!".contains(c)
    def isNameRest(c: Char) =
      c.isDigit || c == '.' || c == ':' || isNameHead(c)
    while (i < n) {
      val c = s(i)
      if (" \n\r\t,".contains(c)) i += 1
      else if (c == '(') { out += TSym("("); i += 1 }
      else if (c == ')') { out += TSym(")"); i += 1 }
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw ParseException("unterminated string")
          s(i) match {
            case '"' => done = true; i += 1
            case '\\' if i + 1 < n =>
              s(i + 1) match {
                case 'n' => sb += '\n'; case 't' => sb += '\t'
                case 'r' => sb += '\r'; case other => sb += other
              }
              i += 2
            case other => sb += other; i += 1
          }
        }
        out += TStr(sb.toString)
      } else if (c == '=' && i + 1 < n && s(i + 1) == '~') { out += TSym("=~"); i += 2 }
      else if (c == '~' && i + 1 < n && s(i + 1) == '=') { out += TSym("~="); i += 2 }
      else if (c == '!' && i + 1 < n && s(i + 1) == '=') { out += TSym("!="); i += 2 }
      else if (c == '<' && i + 1 < n && s(i + 1) == '=') { out += TSym("<="); i += 2 }
      else if (c == '>' && i + 1 < n && s(i + 1) == '=') { out += TSym(">="); i += 2 }
      else if (c == '=') { out += TSym("="); i += 1 }
      else if (c == '<') { out += TSym("<"); i += 1 }
      else if (c == '>') { out += TSym(">"); i += 1 }
      else if (c.isDigit || (c == '-' && i + 1 < n && (s(i + 1).isDigit ||
        s.startsWith("-Infinity", i) || s.startsWith("-NaN", i)))) {
        // number literal: long / float / bign / Infinity / NaN
        if (s.startsWith("-Infinity", i)) { out += TDouble(Double.NegativeInfinity); i += 9 }
        else if (s.startsWith("-NaN", i)) { out += TDouble(Double.NaN); i += 4 }
        else {
          val start = i
          if (c == '-') i += 1
          while (i < n && s(i).isDigit) i += 1
          def toLongTok(str: String): Tok =
            try TLong(str.toLong)
            catch { case _: NumberFormatException =>
              throw ParseException(s"number out of range at $start in: $s") }
          if (i < n && (s(i) == 'n' || s(i) == 'N')) {
            try out += TBig(BigDecimal(s.substring(start, i)))
            catch { case _: NumberFormatException =>
              throw ParseException(s"bad bigint at $start in: $s") }
            i += 1
          } else if (i < n && (s(i) == 'l' || s(i) == 'L')) {
            out += toLongTok(s.substring(start, i)); i += 1
          } else if (i < n && (s(i) == '.' || s(i) == 'e' || s(i) == 'E')) {
            if (s(i) == '.') { i += 1; while (i < n && s(i).isDigit) i += 1 }
            if (i < n && (s(i) == 'e' || s(i) == 'E')) {
              i += 1
              if (i < n && (s(i) == '-' || s(i) == '+')) i += 1
              while (i < n && s(i).isDigit) i += 1
            }
            try out += TDouble(s.substring(start, i).toDouble)
            catch { case _: NumberFormatException =>
              throw ParseException(s"bad number at $start in: $s") }
          } else out += toLongTok(s.substring(start, i))
        }
      } else if (s.startsWith("Infinity", i) && (i + 8 == n || !isNameRest(s(i + 8)))) {
        out += TDouble(Double.PositiveInfinity); i += 8
      } else if (s.startsWith("NaN", i) && (i + 3 == n || !isNameRest(s(i + 3)))) {
        out += TDouble(Double.NaN); i += 3
      } else if (isNameHead(c)) {
        val start = i
        i += 1
        while (i < n && isNameRest(s(i))) i += 1
        out += TName(s.substring(start, i))
      } else throw ParseException(s"unexpected char '$c' at $i in: $s")
    }
    out.toList
  }

  // ------------------------------------------------------------ Parser
  /** Parse a query string to the AST. Precedence: not > and > or,
    * parens group (reference query.g4 predicate rule order). */
  def parse(input: String): Ast = {
    var toks = tokenize(input)
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = toks match {
      case t :: rest => toks = rest; t
      case Nil => throw ParseException("unexpected end of input")
    }
    def expect(sym: String): Unit = next() match {
      case TSym(`sym`) => ()
      case other => throw ParseException(s"expected $sym, got $other")
    }

    def orExpr(): Ast = {
      var l = andExpr()
      while (peek.contains(TName("or"))) { next(); l = Or(l, andExpr()) }
      l
    }
    def andExpr(): Ast = {
      var l = notExpr()
      while (peek.contains(TName("and"))) { next(); l = And(l, notExpr()) }
      l
    }
    def notExpr(): Ast = peek match {
      case Some(TName("not")) => next(); Not(notExpr())
      case _ => primary()
    }
    def value(): Ast = next() match {
      case TName("true") => BoolLit(true)
      case TName("false") => BoolLit(false)
      case TName("nil") | TName("null") => NullLit
      case TName(f) => FieldRef(f)
      case TStr(v) => StrLit(v)
      case TLong(v) => LongLit(v)
      case TDouble(v) => DoubleLit(v)
      case TBig(v) => BigLit(v)
      case other => throw ParseException(s"expected value, got $other")
    }
    def primary(): Ast = peek match {
      case Some(TSym("(")) =>
        next(); val p = orExpr(); expect(")"); p
      case Some(TName("tagged")) =>
        next()
        next() match {
          case TStr(t) => Tagged(t)
          case other => throw ParseException(s"tagged needs a string, got $other")
        }
      case _ =>
        val v = value()
        peek match {
          case Some(TSym(op @ ("=" | "!=" | "<" | ">" | "<=" | ">="))) =>
            next(); Cmp(op, v, value())
          case Some(TSym("=~")) =>
            next()
            next() match {
              case TStr(p) => LikeMatch(v, p)
              case other => throw ParseException(s"=~ needs a string, got $other")
            }
          case Some(TSym("~=")) =>
            next()
            next() match {
              case TStr(p) => RegexMatch(v, p)
              case other => throw ParseException(s"~= needs a string, got $other")
            }
          case _ => v
        }
    }
    val result = orExpr()
    if (toks.nonEmpty) throw ParseException(s"trailing tokens: $toks")
    result
  }

  // ---------------------------------------------------------- Compiler
  /** Compile an AST to a Catalyst boolean Column against a relation with
    * the given schema. Unknown field names resolve to
    * `attributes[name]` when an `attributes` map column exists, else to
    * a null literal (field absent ≈ nil in the reference). */
  def compile(ast: Ast, schema: StructType): Column = {
    val hasAttrs = schema.fieldNames.contains("attributes")
    def fieldType(name: String): Option[DataType] =
      schema.fields.find(_.name == name).map(_.dataType)
    def resolve(name: String): Column =
      if (fieldType(name).isDefined) col(name)
      else if (hasAttrs) col("attributes").getItem(name)
      else lit(null).cast(StringType)

    def isNumericType(dt: DataType): Boolean = dt match {
      case _: NumericType => true
      case _ => false
    }
    // numeric rendering of a value AST: null when not a number
    def numeric(a: Ast): Column = a match {
      case LongLit(v) => lit(v)
      case DoubleLit(v) => lit(v)
      case BigLit(v) => lit(v.toDouble)
      case StrLit(v) => lit(v).try_cast(DoubleType)
      case FieldRef(f) => fieldType(f) match {
        case Some(dt) if isNumericType(dt) => col(f)
        case Some(TimestampType) => unix_timestamp(col(f))
        case Some(_) => col(f).try_cast(DoubleType)
        case None => resolve(f).try_cast(DoubleType)
      }
      case _ => lit(null).cast(DoubleType)
    }
    // general rendering (for equality); non-value nodes can't appear as
    // comparison operands by construction of the grammar
    def render(a: Ast): Column = a match {
      case BoolLit(v) => lit(v)
      case NullLit => lit(null)
      case LongLit(v) => lit(v)
      case DoubleLit(v) => lit(v)
      case BigLit(v) => lit(v.toDouble)
      case StrLit(v) => lit(v)
      case FieldRef(f) => resolve(f)
      case other => throw ParseException(s"not a value: $other")
    }
    def isNumericAst(a: Ast): Boolean = a match {
      case _: LongLit | _: DoubleLit | _: BigLit => true
      case FieldRef(f) => fieldType(f).exists(isNumericType)
      case _ => false
    }
    def isStringish(a: Ast): Boolean = a match {
      case _: StrLit => true
      case FieldRef(f) => fieldType(f) match {
        case Some(StringType) => true
        case Some(_) => false
        case None => true // attribute values are strings
      }
      case _ => false
    }
    def isTimestampAst(a: Ast): Boolean = a match {
      case FieldRef(f) => fieldType(f).contains(TimestampType)
      case _ => false
    }
    def isBoolAst(a: Ast): Boolean = a match {
      case _: BoolLit => true
      case FieldRef(f) => fieldType(f).contains(BooleanType)
      case _ => false
    }
    def eq(l: Ast, r: Ast): Column =
      // type-strict boolean equality, like Clojure `=` (query.clj): a
      // boolean never equals a string/number — and under ANSI mode a
      // cast-based compare would RUNTIME-throw on the first non-boolean
      // string, killing a served query mid-scan (nil stays on the
      // null-safe path below, which already yields false)
      if (((isBoolAst(l) && !isBoolAst(r) && r != NullLit) ||
          (isBoolAst(r) && !isBoolAst(l) && l != NullLit)))
        lit(false)
      else eqNonBool(l, r)
    def eqNonBool(l: Ast, r: Ast): Column =
      // mixed string/number: numeric try-cast comparison
      if ((isNumericAst(l) && isStringish(r)) || (isNumericAst(r) && isStringish(l)))
        numeric(l) <=> numeric(r)
      // riemann `time` is epoch seconds (event.proto int64): equality
      // against a number compares unix seconds, like < / > already do
      else if ((isTimestampAst(l) && isNumericAst(r)) ||
          (isTimestampAst(r) && isNumericAst(l)))
        numeric(l) <=> numeric(r)
      else render(l) <=> render(r)

    def bool(a: Ast): Column = a match {
      case And(l, r) => bool(l) && bool(r)
      case Or(l, r) => bool(l) || bool(r)
      case Not(p) =>
        // Clojure (not nil) = true: treat null predicate as false first
        !coalesce(bool(p), lit(false))
      case Cmp("=", l, r) => eq(l, r)
      case Cmp("!=", l, r) => !eq(l, r)
      case Cmp(op, l, r) =>
        val (a1, b1) = (numeric(l), numeric(r))
        val c = op match {
          case "<" => a1 < b1
          case ">" => a1 > b1
          case "<=" => a1 <= b1
          case ">=" => a1 >= b1
        }
        // numeric guard (reference query.clj:124-132): null operand → false
        a1.isNotNull && b1.isNotNull && c
      case LikeMatch(t, pat) =>
        // `%` multi-char wildcard, everything else literal (make-regex,
        // reference query.clj:146-155); escape SQL LIKE's `_`
        render(t).like(pat.replace("\\", "\\\\").replace("_", "\\_"))
      case RegexMatch(t, pat) =>
        render(t).rlike(pat) // re-find: unanchored
      case Tagged(t) =>
        if (schema.fieldNames.contains("tags")) array_contains(col("tags"), t)
        else lit(false)
      case BoolLit(v) => lit(v)
      case NullLit => lit(false)
      case StrLit(_) | LongLit(_) | DoubleLit(_) | BigLit(_) => lit(true)
      case FieldRef(f) => fieldType(f) match {
        case Some(BooleanType) => coalesce(col(f), lit(false))
        case _ => resolve(f).isNotNull // truthiness: non-nil (non-false)
      }
    }
    coalesce(bool(ast), lit(false))
  }

  /** Parse + compile in one step. */
  def predicate(query: String, schema: StructType): Column =
    compile(parse(query), schema)
}
