package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Safe custom-constraint expression compiler.
  *
  * The reference evaluates `customConstraints` strings per-row with a sandboxed
  * evaluator over the row's float-coercible cells (reference:
  * ckanext/validation/custom_checks.py:14-57, using simpleeval). We instead
  * parse a restricted grammar — identifiers, numeric literals, `+ - * / %`,
  * comparisons, `and/or/not`, parentheses — directly into a Catalyst `Column`,
  * so the constraint runs inside whole-stage codegen with no interpreter and no
  * sandbox to escape: anything outside the grammar is a parse error, which (per
  * the reference semantics, tests/test_custom_checks.py:41-53) fails EVERY row
  * rather than crashing the run.
  *
  * Null/skip semantics (the fork's key divergence from upstream goodtables,
  * custom_checks.py:42-43): a row where any referenced name is missing or not
  * float-coercible is SKIPPED, not failed. `compileViolation` encodes that as a
  * null-safe guard column.
  */
object ConstraintExpr {

  sealed trait Ast
  final case class Num(v: Double) extends Ast
  final case class Ident(name: String) extends Ast
  final case class Un(op: String, e: Ast) extends Ast
  final case class Bin(op: String, l: Ast, r: Ast) extends Ast

  final case class ParseError(message: String)

  // ---- tokenizer ----
  private sealed trait Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TId(s: String) extends Tok
  private final case class TOp(s: String) extends Tok
  private case object TLParen extends Tok
  private case object TRParen extends Tok

  private def tokenize(s: String): Either[ParseError, List[Tok]] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < s.length && s(i + 1).isDigit)) {
        val start = i
        while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
        out += TNum(s.substring(start, i).toDouble)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += TId(s.substring(start, i))
      } else if (c == '(') { out += TLParen; i += 1 }
      else if (c == ')') { out += TRParen; i += 1 }
      else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (Set("<=", ">=", "==", "!=").contains(two)) { out += TOp(two); i += 2 }
        else if ("+-*/%<>".contains(c)) { out += TOp(c.toString); i += 1 }
        else return Left(ParseError(s"Unexpected character '$c' at $i"))
      }
    }
    Right(out.result())
  }

  // ---- Pratt parser ----
  private class P(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }

    private def prec(t: Tok): Int = t match {
      case TId("or")                                   => 1
      case TId("and")                                  => 2
      case TOp("<") | TOp(">") | TOp("<=") | TOp(">=") => 3
      case TOp("==") | TOp("!=")                       => 3
      case TOp("+") | TOp("-")                         => 4
      case TOp("*") | TOp("/") | TOp("%")              => 5
      case _                                           => 0
    }

    def parseExpr(minPrec: Int): Ast = {
      var left = parseUnary()
      var continue = true
      while (continue) {
        peek match {
          case Some(t) if prec(t) >= math.max(minPrec, 1) =>
            val op = next() match {
              case TId(s) => s
              case TOp(s) => s
              case other  => throw new IllegalArgumentException(s"Bad operator $other")
            }
            val right = parseExpr(prec(t) + 1)
            left = Bin(op, left, right)
          case _ => continue = false
        }
      }
      left
    }

    private def parseUnary(): Ast = peek match {
      case Some(TOp("-"))     => next(); Un("-", parseUnary())
      // Python precedence: `not` binds LOOSER than comparisons, tighter than
      // `and` — so `not x > 1` is not(x > 1). Its operand is parsed at the
      // comparison level (3), not as a tight unary.
      case Some(TId("not"))   => next(); Un("not", parseExpr(3))
      case Some(TNum(_))      => val TNum(v) = next(): @unchecked; Num(v)
      case Some(TId(s)) if s != "and" && s != "or" => next(); Ident(s)
      case Some(TLParen) =>
        next()
        val e = parseExpr(1)
        peek match {
          case Some(TRParen) => next(); e
          case _             => throw new IllegalArgumentException("Expected ')'")
        }
      case other => throw new IllegalArgumentException(s"Unexpected token $other")
    }
  }

  def parse(constraint: String): Either[ParseError, Ast] =
    tokenize(constraint).flatMap { toks =>
      try {
        val p = new P(toks)
        val ast = p.parseExpr(1)
        if (p.toks.nonEmpty) Left(ParseError(s"Trailing tokens: ${p.toks}"))
        else Right(ast)
      } catch { case e: IllegalArgumentException => Left(ParseError(e.getMessage)) }
    }

  def identifiers(ast: Ast): Set[String] = ast match {
    case Ident(n)     => Set(n)
    case Num(_)       => Set.empty
    case Un(_, e)     => identifiers(e)
    case Bin(_, l, r) => identifiers(l) ++ identifiers(r)
  }

  /** Is this sub-expression boolean-typed once compiled? (comparisons and
    * logical connectives yes; arithmetic/identifiers/literals are doubles) */
  private def isBool(ast: Ast): Boolean = ast match {
    case Bin(op, _, _) => Set("<", "<=", ">", ">=", "==", "!=", "and", "or")(op)
    case Un("not", _)  => true
    case _             => false
  }

  private def asBool(ast: Ast, c: Column): Column =
    if (isBool(ast)) c else c =!= lit(0d)

  /** Compile the AST to a boolean Column. Identifiers resolve to the row's
    * cells cast to double (the reference floats every coercible cell,
    * custom_checks.py:28-33). */
  def toColumn(ast: Ast): Column = ast match {
    case Num(v)   => lit(v)
    case Ident(n) => col(n).cast("double")
    case Un("-", e)   => -toColumn(e)
    // `not` over a non-boolean operand is Python truthiness (not 0.0 == True)
    // — and applying ! to a double column would fail analysis at plan time
    case Un("not", e) => if (isBool(e)) !toColumn(e) else toColumn(e) === lit(0d)
    case Un(op, _)    => throw new IllegalArgumentException(s"Bad unary op $op")
    case Bin(op, l, r) =>
      val (a, b) = (toColumn(l), toColumn(r))
      op match {
        case "+"   => a + b
        case "-"   => a - b
        case "*"   => a * b
        case "/"   => a / b
        case "%"   => a % b
        case "<"   => a < b
        case "<="  => a <= b
        case ">"   => a > b
        case ">="  => a >= b
        case "=="  => a === b
        case "!="  => a =!= b
        // logical connectives coerce non-boolean operands via truthiness
        // (Python `1 and x`): a raw && over double columns fails analysis
        case "and" => asBool(l, a) && asBool(r, b)
        case "or"  => asBool(l, a) || asBool(r, b)
        case other => throw new IllegalArgumentException(s"Bad operator $other")
      }
  }

  /** Violation condition for one constraint over a frame with `columns`:
    * true ⇔ this row fails the constraint.
    *
    * - referenced name not a column, or its cell null / not float-coercible →
    *   row skipped (condition false) — custom_checks.py:42-43;
    * - parse error → every row fails — tests/test_custom_checks.py:41-53.
    */
  def compileViolation(constraint: String, columns: Seq[String]): Column =
    parse(constraint) match {
      case Left(_) => lit(true)
      case Right(ast) =>
        val names = identifiers(ast).toSeq.sorted
        // name not a column at all ⇒ NameNotDefined ⇒ skip, NOT fail
        // (custom_checks.py:42-43)
        if (!names.forall(columns.contains)) lit(false)
        else if (names.isEmpty) {
          // constant constraint: fails every row or none
          !toColumn(ast)
        } else {
          val defined = names.map(n => col(n).cast("double").isNotNull).reduce(_ && _)
          // guard: all referenced cells float-coercible, else skip
          when(defined, coalesce(!toColumn(ast), lit(true))).otherwise(lit(false))
        }
    }
}
