package graft.frontends.cypher

import graft.graph.{Both, Direction, In, Out}
import graft.ir.{Expr, Op}

/** openCypher front-end (SURVEY §2.8; reference
  * crates/grafeo-adapters/src/query/cypher/ — parser + cypher_translator.rs).
  * Hand-rolled lexer + recursive-descent parser over the supported subset:
  *
  *   [MATCH path(, path)* [WHERE e]] [UNWIND e AS x] [WITH items …]
  *   RETURN [DISTINCT] items [ORDER BY k [ASC|DESC], …] [SKIP n] [LIMIT n]
  *
  * Patterns: (v:Label {k: lit, …}) -[r:TYPE*min..max]-> with <- / undirected.
  * Output is the shared IR (graft.ir), compiled by graft.compiler.Compiler.
  */
object CypherLexer {
  sealed trait Tok
  final case class Ident(s: String) extends Tok
  final case class Kw(s: String)(val raw: String) extends Tok // uppercased keyword (raw = source spelling)
  final case class NumLit(s: String) extends Tok
  final case class StrLit(s: String) extends Tok
  final case class Sym(s: String) extends Tok

  private val keywords = Set("MATCH", "WHERE", "RETURN", "WITH", "UNWIND",
    "AS", "ORDER", "BY", "ASC", "DESC", "SKIP", "LIMIT", "DISTINCT", "AND",
    "OR", "XOR", "NOT", "IN", "STARTS", "ENDS", "CONTAINS", "IS", "NULL",
    "TRUE", "FALSE", "CASE", "WHEN", "THEN", "ELSE", "END", "UNION", "ALL",
    "OPTIONAL", "CREATE", "SET", "DELETE", "DETACH", "MERGE", "REMOVE", "ON",
    "INSERT", "HAVING")

  def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        val w = q.substring(start, i)
        if (keywords.contains(w.toUpperCase)) out += Kw(w.toUpperCase)(w)
        else out += Ident(w)
      } else if (c.isDigit) {
        val start = i
        while (i < n && (q(i).isDigit || q(i) == '.') &&
          !(q(i) == '.' && i + 1 < n && q(i + 1) == '.')) i += 1
        out += NumLit(q.substring(start, i))
      } else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && q(i) != quote) {
          if (q(i) == '\\') i = graft.frontends.Lexing.readEscape(q, i, sb)
          else { sb += q(i); i += 1 }
        }
        i += 1
        out += StrLit(sb.toString)
      } else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (Set("->", "<-", "<=", ">=", "<>", "..", "=~", "+=").contains(two)) {
          out += Sym(two); i += 2
        } else { out += Sym(c.toString); i += 1 }
      }
    }
    out.result()
  }
}

object Ast {
  /** `label` is the primary (first) label, `extraLabels` the rest of a
    * multi-label conjunction `(n:A:B)` — the node must carry ALL of them
    * (reference cypher ast.rs:104 NodePattern.labels Vec). The split keeps
    * the primary on the scan (label-pruned NodeScan) and compiles the rest
    * to hasLabel() filters that Catalyst pushes into the same scan.
    */
  final case class NodePat(v: Option[String], label: Option[String],
      props: Seq[(String, Expr.E)], extraLabels: Seq[String] = Nil)
  final case class RelPat(v: Option[String], relTypes: Seq[String],
      dir: Direction, range: Option[(Int, Int)])
  /** `shortest`: Some(pathVarOpt) when the pattern is wrapped in
    * shortestPath()/allShortestPaths() (`shortestAll` tells them apart);
    * binds endpoints + length(p), and nodes(p)/relationships(p) when the
    * query consumes them (minimal-path enumeration). `pathVar` is a plain
    * `p = (…)` binding on an ordinary pattern: length(p) resolves to the
    * walk length (fixed rel count + var-length hops).
    */
  final case class PathPat(head: NodePat, tail: Seq[(RelPat, NodePat)],
      shortest: Option[Option[String]] = None, pathVar: Option[String] = None,
      shortestAll: Boolean = false)
  sealed trait Clause
  final case class MatchClause(paths: Seq[PathPat], where: Option[Expr.E],
      optional: Boolean = false) extends Clause
  final case class UnwindClause(list: Expr.E, as: String) extends Clause
  final case class CreateClause(path: PathPat) extends Clause
  /** SET item forms (ref cypher ast.rs SetItem: Property / AllProperties /
    * MergeProperties / Labels).
    */
  sealed trait SetItem
  final case class SetProp(p: Expr.Prop, value: Expr.E) extends SetItem
  final case class SetAllProps(v: String, map: Expr.MapLit, merge: Boolean) extends SetItem
  final case class SetLabel(v: String, labels: Seq[String]) extends SetItem
  final case class SetClause(items: Seq[SetItem]) extends Clause
  final case class DeleteClause(vars: Seq[String], detach: Boolean) extends Clause
  final case class MergeClause(node: NodePat,
      onCreate: Seq[(Expr.Prop, Expr.E)] = Seq.empty,
      onMatch: Seq[(Expr.Prop, Expr.E)] = Seq.empty) extends Clause
  final case class RemoveClause(v: String, label: String) extends Clause
  final case class RemovePropClause(v: String, prop: String) extends Clause
  final case class WithRet(items: Seq[(Expr.E, Option[String])],
      distinct: Boolean, where: Option[Expr.E], orderBy: Seq[(Expr.E, Boolean)],
      skip: Option[Long], limit: Option[Long], isReturn: Boolean) extends Clause
  final case class Query(clauses: Seq[Clause])
}

final class CypherParser(tokens: Vector[CypherLexer.Tok]) {
  import CypherLexer._
  import Ast._

  private var pos = 0
  private def peek: Option[Tok] = if (pos < tokens.length) Some(tokens(pos)) else None
  private def next(): Tok = {
    if (pos >= tokens.length) fail("unexpected end of query")
    val t = tokens(pos); pos += 1; t
  }
  private def at(t: Tok): Boolean = peek.contains(t)
  private def eat(t: Tok): Boolean = if (at(t)) { pos += 1; true } else false
  private def expect(t: Tok): Unit =
    if (!eat(t)) fail(s"expected $t, found ${peek.getOrElse("<eof>")}")
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"cypher parse error at token $pos: $msg")

  private var anonCounter = 0
  private def fresh(): String = { anonCounter += 1; s"__anon$anonCounter" }

  /** Full statement: query (UNION [ALL] query)* — plain UNION has set
    * semantics, UNION ALL bag semantics (ref plan.rs:506-510 Union; mixing
    * the two in one statement is invalid, as in openCypher).
    */
  def parseUnion(): Seq[(Query, Boolean)] = {
    val parts = Seq.newBuilder[(Query, Boolean)]
    parts += ((parseQuery(), false))
    while (eat(Kw("UNION")(""))) {
      val all = eat(Kw("ALL")(""))
      parts += ((parseQuery(), all))
    }
    if (pos < tokens.length) fail(s"trailing tokens from ${tokens(pos)}")
    parts.result()
  }

  def parseQuery(): Query = {
    val clauses = Seq.newBuilder[Clause]
    var done = false
    while (!done && pos < tokens.length) {
      peek match {
        case Some(Kw("OPTIONAL")) =>
          next(); expect(Kw("MATCH")("")); clauses += parseMatch(optional = true)
        case Some(Kw("MATCH"))  => next(); clauses += parseMatch()
        case Some(Kw("UNWIND")) => next(); clauses += parseUnwind()
        case Some(Kw("WITH"))   => next(); clauses += parseWithRet(isReturn = false)
        case Some(Kw("RETURN")) => next(); clauses += parseWithRet(isReturn = true); done = true
        case Some(Kw("CREATE")) => next(); clauses += CreateClause(parsePath())
        case Some(Kw("INSERT")) =>
          // GQL INSERT (gql_translator.rs): same node/edge-pattern semantics
          // as Cypher CREATE; comma-separated patterns allowed
          next()
          clauses += CreateClause(parsePath())
          while (eat(Sym(","))) clauses += CreateClause(parsePath())
        case Some(Kw("MERGE"))  => next(); clauses += parseMerge()
        case Some(Kw("SET"))    => next(); clauses += parseSet()
        case Some(Kw("DETACH")) =>
          next(); expect(Kw("DELETE")("")); clauses += parseDelete(detach = true)
        case Some(Kw("DELETE")) => next(); clauses += parseDelete(detach = false)
        case Some(Kw("REMOVE")) => next(); clauses ++= parseRemove()
        case other => fail(s"unexpected $other")
      }
    }
    // a following UNION belongs to the enclosing multi-query statement
    if (pos < tokens.length && !at(Kw("UNION")("")))
      fail(s"trailing tokens from ${tokens(pos)}")
    val cs = clauses.result()
    require(cs.nonEmpty, "empty query")
    Query(cs)
  }

  private def parseMerge(): MergeClause = {
    val node = parseNodePat()
    var onCreate = Seq.empty[(Expr.Prop, Expr.E)]
    var onMatch = Seq.empty[(Expr.Prop, Expr.E)]
    while (at(Kw("ON")("")) ) {
      next()
      val isCreate = peek match {
        case Some(Kw("CREATE")) => next(); true
        case Some(Kw("MATCH"))  => next(); false
        case other => fail(s"expected CREATE or MATCH after ON, got $other")
      }
      expect(Kw("SET")(""))
      val items = parseSet().items.map {
        case SetProp(p, value) => (p, value)
        case other => fail(s"ON CREATE/MATCH SET supports var.prop = expr items, got $other")
      }
      if (isCreate) onCreate = onCreate ++ items else onMatch = onMatch ++ items
    }
    MergeClause(node, onCreate, onMatch)
  }

  private def parseSet(): SetClause = {
    val items = Seq.newBuilder[SetItem]
    def one(): Unit = {
      val v = next() match {
        case Ident(x) => x
        case other => fail(s"SET expects a variable, got $other")
      }
      peek match {
        case Some(Sym(".")) =>
          next()
          val k = next() match {
            case Ident(x) => x
            case other => fail(s"SET expects var.prop, got $other")
          }
          expect(Sym("="))
          items += SetProp(Expr.Prop(v, k), parseExpr())
        case Some(Sym(":")) =>
          // SET n:Label1:Label2 (ast.rs SetItem::Labels)
          val labels = Seq.newBuilder[String]
          while (eat(Sym(":"))) labels += (next() match {
            case Ident(l) => l
            case k: Kw if k.raw.nonEmpty => k.raw
            case other => fail(s"expected label, got $other")
          })
          items += SetLabel(v, labels.result())
        case Some(Sym(op @ ("=" | "+="))) =>
          // SET n = {map} replaces all properties; n += {map} merges
          // (ast.rs SetItem::AllProperties / MergeProperties)
          next()
          parseExpr() match {
            case m: Expr.MapLit => items += SetAllProps(v, m, merge = op == "+=")
            case other => fail(s"SET $v $op expects a map literal, got $other")
          }
        case other => fail(s"SET expects var.prop, var:Label or var = {map}, got $other")
      }
    }
    one()
    while (eat(Sym(","))) one()
    SetClause(items.result())
  }

  private def parseDelete(detach: Boolean): DeleteClause = {
    val vars = Seq.newBuilder[String]
    def one(): Unit = next() match {
      case Ident(v) => vars += v
      case other => fail(s"DELETE expects variables, got $other")
    }
    one()
    while (eat(Sym(","))) one()
    DeleteClause(vars.result(), detach)
  }

  /** REMOVE items (reference cypher ast.rs:350-361 RemoveItem): either
    * labels `n:A:B` (one clause per label) or a property `n.prop`;
    * comma-separated items allowed.
    */
  private def parseRemove(): Seq[Clause] = {
    val out = Seq.newBuilder[Clause]
    def item(): Unit = {
      val v = next() match {
        case Ident(x) => x
        case other => fail(s"REMOVE expects var:Label or var.prop, got $other")
      }
      if (eat(Sym("."))) {
        val prop = next() match {
          case Ident(p) => p
          case other => fail(s"expected property name, got $other")
        }
        out += RemovePropClause(v, prop)
      } else {
        expect(Sym(":"))
        def label(): Unit = next() match {
          case Ident(l) => out += RemoveClause(v, l)
          case other => fail(s"expected label, got $other")
        }
        label()
        while (eat(Sym(":"))) label()
      }
    }
    item()
    while (eat(Sym(","))) item()
    out.result()
  }

  private def parseMatch(optional: Boolean = false): MatchClause = {
    val paths = Seq.newBuilder[PathPat]
    paths += parsePath()
    while (eat(Sym(","))) paths += parsePath()
    val where = if (eat(Kw("WHERE")(""))) Some(parseExpr()) else None
    MatchClause(paths.result(), where, optional)
  }

  private def parsePath(): PathPat = {
    // `p = shortestPath((a)-[:T*..k]->(b))` / `allShortestPaths(...)`
    // (cypher/ast.rs:86-99); general path-variable binding is not supported.
    val pathVar = (peek, tokens.lift(pos + 1)) match {
      case (Some(Ident(pv)), Some(Sym("="))) => pos += 2; Some(pv)
      case _ => None
    }
    var isAll = false
    val isShortest = peek match {
      case Some(Ident(fn))
          if fn.equalsIgnoreCase("shortestPath") ||
            fn.equalsIgnoreCase("allShortestPaths") =>
        next(); isAll = fn.equalsIgnoreCase("allShortestPaths"); true
      case _ => false
    }
    if (isShortest) expect(Sym("("))
    val head = parseNodePat()
    val tail = Seq.newBuilder[(RelPat, NodePat)]
    var go = true
    while (go) {
      peek match {
        case Some(Sym("-")) | Some(Sym("<-")) =>
          val rel = parseRelPat()
          val node = parseNodePat()
          tail += ((rel, node))
        case _ => go = false
      }
    }
    if (isShortest) expect(Sym(")"))
    PathPat(head, tail.result(),
      if (isShortest) Some(pathVar) else None,
      if (isShortest) None else pathVar,
      shortestAll = isAll)
  }

  private def parseNodePat(): NodePat = {
    expect(Sym("("))
    val v = peek match {
      case Some(Ident(name)) => next(); Some(name)
      case Some(k: Kw) if !at(Sym(":")) && k.raw.nonEmpty => next(); Some(k.raw)
      case _ => None
    }
    val allLabels = Seq.newBuilder[String]
    while (eat(Sym(":"))) allLabels += (peek match {
      case Some(Ident(l)) => next(); l
      case Some(k: Kw) if k.raw.nonEmpty => next(); k.raw
      case _ => fail("expected label")
    })
    val labels = allLabels.result()
    val label = labels.headOption
    val props = Seq.newBuilder[(String, Expr.E)]
    if (eat(Sym("{"))) {
      var go = !at(Sym("}"))
      while (go) {
        val k = next() match {
          case Ident(s) => s
          case kk: Kw if kk.raw.nonEmpty => kk.raw
          case other => fail(s"expected property key, got $other")
        }
        expect(Sym(":"))
        props += ((k, parseExpr()))
        go = eat(Sym(","))
      }
      expect(Sym("}"))
    }
    expect(Sym(")"))
    NodePat(v, label, props.result(), labels.drop(1))
  }

  private def parseRelPat(): RelPat = {
    // '-' or '<-' … then optional [v:TYPE*a..b] … then '->' or '-'
    val leftArrow = peek match {
      case Some(Sym("<-")) => next(); true
      case Some(Sym("-"))  => next(); false
      case other => fail(s"expected relationship, got $other")
    }
    var v: Option[String] = None
    val relTypes = Seq.newBuilder[String]
    var range: Option[(Int, Int)] = None
    if (eat(Sym("["))) {
      peek match {
        case Some(Ident(name)) => next(); v = Some(name)
        case _ =>
      }
      if (eat(Sym(":"))) {
        // `:A|B|C` alternation (also the legacy `:A|:B` form) — the reference
        // keeps a type list on its relationship pattern
        def relName(): String = peek match {
          case Some(Ident(t)) => next(); t
          case Some(k: Kw) if k.raw.nonEmpty => next(); k.raw
          case _ => fail("expected relationship type")
        }
        relTypes += relName()
        while (eat(Sym("|"))) { eat(Sym(":")); relTypes += relName() }
      }
      if (eat(Sym("*"))) {
        // [*] / [*n] / [*a..b] / [*a..] / [*..b]; hi = -1 means unbounded
        // (max_hops: Option, plan.rs:195) — terminated by the visited-set
        // guard in the path-carrying expand.
        var lo = 1
        var hi = -1
        peek match {
          case Some(NumLit(s2)) => next(); lo = s2.toInt; hi = lo
          case _ =>
        }
        if (eat(Sym(".."))) {
          hi = peek match {
            case Some(NumLit(s2)) => next(); s2.toInt
            case _ => -1
          }
        }
        range = Some((lo, hi))
      }
      expect(Sym("]"))
    }
    val rightArrow = peek match {
      case Some(Sym("->")) => next(); true
      case Some(Sym("-"))  => next(); false
      case other => fail(s"expected -> or -, got $other")
    }
    val dir =
      if (leftArrow && !rightArrow) In
      else if (!leftArrow && rightArrow) Out
      else if (!leftArrow && !rightArrow) Both
      else fail("<- … -> is not a valid relationship")
    RelPat(v, relTypes.result(), dir, range)
  }

  private def parseUnwind(): UnwindClause = {
    val e = parseExpr()
    expect(Kw("AS")(""))
    val as = next() match {
      case Ident(s) => s
      case other => fail(s"expected identifier, got $other")
    }
    UnwindClause(e, as)
  }

  private def parseWithRet(isReturn: Boolean): WithRet = {
    val distinct = eat(Kw("DISTINCT")(""))
    val items = Seq.newBuilder[(Expr.E, Option[String])]
    def item(): Unit = peek match {
      // RETURN * / WITH * — all bound variables (compiled to the non-internal
      // columns; nodes surface as their ids, the binding convention here)
      case Some(Sym("*")) => next(); items += ((Expr.Var("*"), None))
      case _ =>
        val e = parseExpr()
        val alias = if (eat(Kw("AS")(""))) next() match {
          case Ident(s) => Some(s)
          case other => fail(s"expected alias, got $other")
        } else None
        items += ((e, alias))
    }
    item()
    while (eat(Sym(","))) item()
    // GQL HAVING (gql/ast.rs:47 HavingClause, parsed after RETURN in the
    // reference): same post-projection filter slot as WITH … WHERE — both
    // apply after aggregation, so they share the `where` channel (AND'd).
    val whereKw = if (eat(Kw("WHERE")(""))) Some(parseExpr()) else None
    val having = if (eat(Kw("HAVING")(""))) Some(parseExpr()) else None
    val where = (whereKw, having) match {
      case (Some(w), Some(h)) => Some(Expr.Bin("and", w, h): Expr.E)
      case (w, h)             => w.orElse(h)
    }
    val orderBy = Seq.newBuilder[(Expr.E, Boolean)]
    if (eat(Kw("ORDER")(""))) {
      expect(Kw("BY")(""))
      def key(): Unit = {
        val e = parseExpr()
        val asc = if (eat(Kw("DESC")(""))) false else { eat(Kw("ASC")("")); true }
        orderBy += ((e, asc))
      }
      key()
      while (eat(Sym(","))) key()
    }
    val skip = if (eat(Kw("SKIP")(""))) Some(parseNum()) else None
    val limit = if (eat(Kw("LIMIT")(""))) Some(parseNum()) else None
    WithRet(items.result(), distinct, where, orderBy.result(), skip, limit, isReturn)
  }

  private def parseNum(): Long = next() match {
    case NumLit(s) => s.toLong
    case other => fail(s"expected number, got $other")
  }

  // ---- expressions ----
  def parseExpr(): Expr.E = parseOr()

  private def parseOr(): Expr.E = {
    var e = parseXor()
    while (eat(Kw("OR")(""))) e = Expr.Bin("or", e, parseXor())
    e
  }
  private def parseXor(): Expr.E = {
    var e = parseAnd()
    while (eat(Kw("XOR")(""))) e = Expr.Bin("xor", e, parseAnd())
    e
  }
  private def parseAnd(): Expr.E = {
    var e = parseNot()
    while (eat(Kw("AND")(""))) e = Expr.Bin("and", e, parseNot())
    e
  }
  private def parseNot(): Expr.E =
    if (eat(Kw("NOT")(""))) Expr.Not(parseNot()) else parseCmp()

  private def parseCmp(): Expr.E = {
    var e = parseAdd()
    var go = true
    while (go) {
      peek match {
        case Some(Sym(op @ ("=" | "<>" | "<" | "<=" | ">" | ">=" | "=~"))) =>
          next(); e = Expr.Bin(op, e, parseAdd())
        case Some(Kw("IN")) =>
          next(); e = Expr.Bin("in", e, parseAdd())
        case Some(Kw("STARTS")) =>
          next(); expect(Kw("WITH")("")); e = Expr.Bin("startswith", e, parseAdd())
        case Some(Kw("ENDS")) =>
          next(); expect(Kw("WITH")("")); e = Expr.Bin("endswith", e, parseAdd())
        case Some(Kw("CONTAINS")) =>
          next(); e = Expr.Bin("contains", e, parseAdd())
        case Some(Kw("IS")) =>
          next()
          val negated = eat(Kw("NOT")(""))
          expect(Kw("NULL")(""))
          e = Expr.IsNull(e, negated)
        case _ => go = false
      }
    }
    e
  }

  private def parseAdd(): Expr.E = {
    var e = parseMul()
    var go = true
    while (go) {
      peek match {
        case Some(Sym(op @ ("+" | "-"))) => next(); e = Expr.Bin(op, e, parseMul())
        case _ => go = false
      }
    }
    e
  }
  private def parseMul(): Expr.E = {
    var e = parseUnary()
    var go = true
    while (go) {
      peek match {
        case Some(Sym(op @ ("*" | "/" | "%" | "^"))) => next(); e = Expr.Bin(op, e, parseUnary())
        case _ => go = false
      }
    }
    e
  }
  private def parseUnary(): Expr.E =
    if (eat(Sym("-"))) Expr.Neg(parseUnary()) else parsePostfix(parseAtom())

  /** Postfix index/slice access: l[0], l[-1], l[1..3], l[..2], l[1..]
    * (ref cypher plan.rs:912-925).
    */
  private def parsePostfix(e0: Expr.E): Expr.E = {
    var e = e0
    while (eat(Sym("["))) {
      if (eat(Sym(".."))) {
        val t = if (!at(Sym("]"))) Some(parseExpr()) else None
        expect(Sym("]")); e = Expr.Slice(e, None, t)
      } else {
        val first = parseExpr()
        if (eat(Sym(".."))) {
          val t = if (!at(Sym("]"))) Some(parseExpr()) else None
          expect(Sym("]")); e = Expr.Slice(e, Some(first), t)
        } else { expect(Sym("]")); e = Expr.Idx(e, first) }
      }
    }
    e
  }

  /** Pattern comprehension `[(a)-[:T]->(b) WHERE p | proj]` (ref cypher
    * ast.rs:440) — attempted when a `[` is followed by `(`; backtracks to the
    * plain list/list-comprehension grammar if no pattern parses (e.g.
    * `[(1+2), 3]`). The projection is mandatory, as in the reference AST.
    */
  private def tryPatternComp(): Option[Expr.E] = {
    if (!at(Sym("("))) return None
    val mark = pos
    try {
      val path = parsePath()
      // a bare parenthesized expression also parses as a var-only node
      // pattern — require an actual relationship to call it a pattern
      if (path.tail.isEmpty) { pos = mark; return None }
      val whereE = if (eat(Kw("WHERE")(""))) Some(parseExpr()) else None
      expect(Sym("|"))
      val proj = parseExpr()
      expect(Sym("]"))
      Some(Expr.CollectSub(CypherFrontend.subPlan(Seq(path), whereE), proj))
    } catch {
      case _: IllegalArgumentException => pos = mark; None
    }
  }

  /** Pattern predicate `(a)-[:T]->(b)` in expression position — openCypher
    * sugar for EXISTS { … } (the reference translates pattern expressions to
    * the same exists plan). Attempted when an expression starts with `(`;
    * backtracks to the parenthesized-expression grammar when no relationship
    * follows (`(a)` alone, `(1+2)`, …).
    */
  private def tryPatternPredicate(): Option[Expr.E] = {
    val mark = pos
    try {
      val path = parsePath()
      if (path.tail.isEmpty) { pos = mark; None }
      else Some(Expr.ExistsSub(CypherFrontend.subPlan(Seq(path), None)))
    } catch {
      case _: IllegalArgumentException => pos = mark; None
    }
  }

  private def parseAtom(): Expr.E = next() match {
    case NumLit(s) =>
      if (s.contains('.')) Expr.Lit(s.toDouble) else Expr.Lit(s.toLong)
    case StrLit(s) => Expr.Lit(s)
    case Kw("TRUE") => Expr.Lit(true)
    case Kw("FALSE") => Expr.Lit(false)
    case Kw("NULL") => Expr.Lit(null)
    case Sym("$") => next() match {
      case Ident(s) => Expr.Param(s)
      case other => fail(s"expected parameter name, got $other")
    }
    case Sym("(") =>
      pos -= 1 // rewind: a pattern predicate needs the full `(…)-[…]-(…)`
      tryPatternPredicate().getOrElse {
        expect(Sym("("))
        val e = parseExpr(); expect(Sym(")")); e
      }
    case Sym("[") =>
      if (at(Sym("]"))) { next(); Expr.ListLit(Seq.empty) }
      else tryPatternComp().getOrElse {
        val first = parseExpr()
        (first, peek) match {
          // [v IN list WHERE p | m] — the IN parses as a Bin("in", Var, list)
          // and the following WHERE / | / ] marks a comprehension (ast.rs:429)
          case (Expr.Bin("in", Expr.Var(v), listE),
              Some(Kw("WHERE") | Sym("|") | Sym("]"))) =>
            val whereE = if (eat(Kw("WHERE")(""))) Some(parseExpr()) else None
            val mapE = if (eat(Sym("|"))) Some(parseExpr()) else None
            expect(Sym("]"))
            Expr.ListComp(v, listE, whereE, mapE)
          case _ =>
            val items = Seq.newBuilder[Expr.E]
            items += first
            while (eat(Sym(","))) items += parseExpr()
            expect(Sym("]"))
            Expr.ListLit(items.result())
        }
      }
    case Sym("{") =>
      // map literal {k: v, …} → struct column
      val items = Seq.newBuilder[(String, Expr.E)]
      var go = !at(Sym("}"))
      while (go) {
        val k = next() match {
          case Ident(s) => s
          case kk: Kw if kk.raw.nonEmpty => kk.raw
          case other => fail(s"expected map key, got $other")
        }
        expect(Sym(":"))
        items += ((k, parseExpr()))
        go = eat(Sym(","))
      }
      expect(Sym("}"))
      Expr.MapLit(items.result())
    case Kw("CASE") =>
      // simple CASE (`CASE x WHEN v THEN r`) desugars to searched form
      val subject = if (!at(Kw("WHEN")(""))) Some(parseExpr()) else None
      val branches = Seq.newBuilder[(Expr.E, Expr.E)]
      while (eat(Kw("WHEN")(""))) {
        val w = parseExpr()
        val c = subject.map(s => Expr.Bin("=", s, w): Expr.E).getOrElse(w)
        expect(Kw("THEN")(""))
        branches += ((c, parseExpr()))
      }
      val orElse = if (eat(Kw("ELSE")(""))) Some(parseExpr()) else None
      expect(Kw("END")(""))
      Expr.CaseW(branches.result(), orElse)
    // `all(…)` lexes as the UNION ALL keyword, not an Ident — route the
    // quantifier call form explicitly
    case Kw("ALL") if at(Sym("(")) =>
      next()
      parseExpr() match {
        case Expr.Bin("in", Expr.Var(v), listE) if at(Kw("WHERE")("")) =>
          next()
          val p = parseExpr()
          expect(Sym(")"))
          Expr.Quant("all", v, listE, p)
        case other => fail(s"expected `v IN list WHERE pred` in all(), got $other")
      }
    case Ident(name) =>
      peek match {
        // EXISTS { (pattern) [WHERE e] } / COUNT { … } subqueries
        // (ref cypher ast.rs:460); MATCH keyword inside the braces optional
        case Some(Sym("{"))
            if name.equalsIgnoreCase("exists") || name.equalsIgnoreCase("count") =>
          next()
          eat(Kw("MATCH")(""))
          val paths = Seq.newBuilder[Ast.PathPat]
          paths += parsePath()
          while (eat(Sym(","))) paths += parsePath()
          val where = if (eat(Kw("WHERE")(""))) Some(parseExpr()) else None
          expect(Sym("}"))
          val sub = CypherFrontend.subPlan(paths.result(), where)
          if (name.equalsIgnoreCase("exists")) Expr.ExistsSub(sub)
          else Expr.CountSub(sub)
        case Some(Sym("(")) =>
          next()
          val distinct = eat(Kw("DISTINCT")(""))
          val args = Seq.newBuilder[Expr.E]
          var quantified: Option[Expr.E] = None
          if (!at(Sym(")"))) {
            if (eat(Sym("*"))) args += Expr.Lit("*")
            else {
              val first = parseExpr()
              // quantifiers `all/any/none/single(v IN list WHERE p)` and
              // `reduce(acc = init, v IN list | step)` (ref cypher ast.rs:429):
              // the first arg parses as Bin("in",…)/Bin("=",…) and the
              // following WHERE / `,` + `|` disambiguates from a plain call
              (name.toLowerCase, first) match {
                case (k @ ("all" | "any" | "none" | "single"),
                    Expr.Bin("in", Expr.Var(v), listE)) if at(Kw("WHERE")("")) =>
                  next()
                  quantified = Some(Expr.Quant(k, v, listE, parseExpr()))
                case ("reduce", Expr.Bin("=", Expr.Var(acc), initE)) =>
                  expect(Sym(","))
                  parseExpr() match {
                    case Expr.Bin("in", Expr.Var(v), listE) =>
                      expect(Sym("|"))
                      quantified = Some(Expr.Reduce(acc, initE, v, listE, parseExpr()))
                    case other => fail(s"expected `v IN list` in reduce(), got $other")
                  }
                case _ =>
                  args += first
                  while (eat(Sym(","))) args += parseExpr()
              }
            }
          }
          expect(Sym(")"))
          quantified.getOrElse(Expr.Func(name, args.result(), distinct))
        case Some(Sym(".")) =>
          next()
          next() match {
            case Ident(k) => Expr.Prop(name, k)
            case other => fail(s"expected property name, got $other")
          }
        case _ => Expr.Var(name)
      }
    case other => fail(s"unexpected token $other")
  }
}

/** AST → shared IR, mirroring the reference's cypher_translator.rs. */
object CypherFrontend {
  import Ast._

  def parse(q: String): Query = {
    val parts = parseAll(q)
    require(parts.size == 1,
      "statement contains UNION — use translateText for multi-query statements")
    parts.head._1
  }

  def parseAll(q: String): Seq[(Query, Boolean)] =
    new CypherParser(CypherLexer.lex(q)).parseUnion()

  /** Parse + translate a full statement, including `UNION [ALL]` chains
    * (ref plan.rs:506-510): UNION ALL concatenates bags, plain UNION adds
    * set semantics over the whole union.
    */
  def translateText(q: String): Op.T = {
    // drop any notes a PREVIOUS statement left behind (it may have thrown
    // before its compile consumed them — on a pooled thread they would
    // otherwise be evaluated against the next query's unrelated graph).
    // Reset here, at STATEMENT granularity, not in translate(): UNION
    // branches and EXISTS/COUNT subqueries call translate() nested, and a
    // per-call reset would wipe earlier branches' qualifying-cycle notes.
    CycleAdvisor.reset()
    val parts = parseAll(q)
    val first = translate(parts.head._1)
    if (parts.size == 1) first
    else {
      val flags = parts.tail.map(_._2).distinct
      require(flags.size == 1, "cannot mix UNION and UNION ALL in one statement")
      val combined = parts.tail.foldLeft(first)((acc, p) => Op.UnionAll(acc, translate(p._1)))
      if (flags.head) combined else Op.Distinct(combined)
    }
  }

  /** Pattern → plan for EXISTS/COUNT { } subqueries (ast.rs:460): the same
    * translation as a standalone MATCH; correlation with the outer query is
    * purely the shared variable columns the semi/anti/count join binds on.
    */
  def subPlan(paths: Seq[Ast.PathPat], where: Option[Expr.E]): Op.T =
    translate(Ast.Query(Seq(Ast.MatchClause(paths, where))))

  def translate(q: Query): Op.T = {
    var cur: Op.T = Op.OneRow
    var anon = 0
    def fresh(): String = { anon += 1; s"__n$anon" }

    val boundVars = scala.collection.mutable.Set.empty[String]
    // names bound as RELATIONSHIP variables — re-binding joins on edge
    // identity, but only when the original binding IS an edge (a node name
    // reused as a rel var has no eid and must be rejected loudly)
    val boundEdgeVars = scala.collection.mutable.Set.empty[String]
    // path variable -> length expression (length(p) resolves to it)
    val pathLenExprs = scala.collection.mutable.Map.empty[String, Expr.E]
    // path variable -> node-walk array column (nodes(p)/relationships(p))
    val pathNodeCols = scala.collection.mutable.Map.empty[String, String]
    // Pre-scan: which path vars the query consumes via nodes()/
    // relationships() — those var-length expands must carry the walk array
    // (Path value logical_type.rs:14-88); the rest keep the cheaper
    // hops-only walk loop.
    val wantsPathNodes: Set[String] = {
      val found = scala.collection.mutable.Set.empty[String]
      def scan(e: Expr.E): Unit = { Expr.rewrite(e) {
        case f @ Expr.Func(n, Seq(Expr.Var(pv)), _)
            if n.equalsIgnoreCase("nodes") || n.equalsIgnoreCase("relationships") =>
          found += pv; f
        case x => x
      }; () }
      q.clauses.foreach {
        case MatchClause(_, w, _) => w.foreach(scan)
        case UnwindClause(e, _)   => scan(e)
        case WithRet(items, _, w, ob, _, _, _) =>
          items.foreach(i => scan(i._1)); w.foreach(scan); ob.foreach(o => scan(o._1))
        case _ => ()
      }
      found.toSet
    }

    // COUNT { } subqueries / pattern comprehensions in an expression become
    // correlated-count / correlated-collect columns joined in below the
    // consumer (plan stays fully distributed)
    var cntIdx = 0
    def extractCounts(op0: Op.T, e: Expr.E): (Op.T, Expr.E) = {
      var acc = op0
      val e2 = Expr.rewrite(e) {
        case Expr.CountSub(sub) =>
          cntIdx += 1
          val c = s"__cnt$cntIdx"
          acc = Op.CorrelatedCount(acc, sub, c)
          Expr.Var(c)
        case Expr.CollectSub(sub, item) =>
          cntIdx += 1
          val c = s"__coll$cntIdx"
          acc = Op.CorrelatedCollect(acc, sub, item, c)
          Expr.Var(c)
        case x => x
      }
      (acc, e2)
    }

    // WHERE splits into conjuncts so [NOT] EXISTS { } lowers to a semi/anti
    // join while the residual predicates stay ordinary filters
    def applyWhere(op0: Op.T, w: Expr.E): Op.T = {
      def conjuncts(e: Expr.E): Seq[Expr.E] = e match {
        case Expr.Bin("and", l, r) => conjuncts(l) ++ conjuncts(r)
        case other => Seq(other)
      }
      conjuncts(w).foldLeft(op0) {
        case (acc, Expr.ExistsSub(sub))           => Op.SemiNaturalJoin(acc, sub)
        case (acc, Expr.Not(Expr.ExistsSub(sub))) => Op.AntiNaturalJoin(acc, sub)
        case (acc, pred) =>
          val (acc2, pred2) = extractCounts(acc, pred)
          Op.Filter(acc2, pred2)
      }
    }

    for (clause <- q.clauses) clause match {
      case MatchClause(paths, where, optional) =>
        var matchOp: Option[Op.T] = None
        for (path <- paths if path.shortest.isDefined) {
          require(path.tail.size == 1,
            "shortestPath() takes a single (a)-[*..max]-(b) relationship pattern")
          val (rel, node) = path.tail.head
          val (lo, hi) = rel.range.getOrElse(
            throw new IllegalArgumentException(
              "shortestPath() needs a var-length pattern, e.g. [:T*1..5]"))
          val headVar = path.head.v.getOrElse(fresh())
          val toVar = node.v.getOrElse(fresh())
          val lenCol = path.shortest.get.map { pv =>
            val c = s"__plen_$pv"; pathLenExprs(pv) = Expr.Var(c); c
          }
          val sPathCol = path.shortest.get.filter(wantsPathNodes.contains).map { pv =>
            val c = s"__pnodes_$pv"; pathNodeCols(pv) = c; c
          }
          var pathOp: Op.T = Op.NodeScan(headVar, path.head.label)
          pathOp = nodeFilters(pathOp, headVar, path.head)
          pathOp = Op.ShortestPath(pathOp, headVar, rel.relTypes, toVar,
            rel.dir, hi, node.label, lenCol, sPathCol, path.shortestAll)
          if (lo > 1) pathOp = Op.Filter(pathOp,
            Expr.Bin(">=", Expr.Var(lenCol.getOrElse(
              throw new IllegalArgumentException(
                "shortestPath() with min hops > 1 needs a path variable"))),
              Expr.Lit(lo.toLong)))
          pathOp = nodeFilters(pathOp, toVar, node)
          (path.head.v.toSeq ++ node.v.toSeq).foreach(boundVars += _)
          matchOp = Some(matchOp.map(Op.NaturalJoin(_, pathOp)).getOrElse(pathOp))
        }
        // relationship-variable re-use (openCypher edge identity): a reused
        // edge var binds a fresh variable plus an eid equality filter — the
        // same rebind-through-binding-table the reference applies to node
        // vars (cypher_translator.rs). Collisions with node variables stay
        // rejected. Filters apply after the clause's joins (the original
        // binding may live in an earlier pattern or clause).
        val edgeRebinds = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

        // ---- cyclic-pattern split (spark.graft.cypher.cycleSplit) --------
        // A long cycle `(a)-…->(a)` compiled left-to-right builds its widest
        // intermediate just before the closing equality — the wedge
        // explosion WCOJ-style evaluation avoids (algos/Wcoj.scala applies
        // the same idea to triangles; the reference never auto-selects its
        // leapfrog operator because its planner lacks a cost model for it —
        // graft's session default is `auto`: CycleAdvisor's per-pattern
        // fanout margin decides, see GraftSession.compileCypher). The
        // frontend itself splits only under `true` or the advisor's forced
        // set; this block alone never changes a plan. The split is purely
        // algebraic: the cycle
        // breaks at its midpoint into two arms that BOTH start from the
        // (selective) cycle variable, and the arms natural-join on
        // {cycle var, midpoint var} — same conjunctive query, same bag of
        // rows, but each arm's intermediates stay proportional to the
        // filtered anchor instead of to the unfiltered far side.
        def splitCycle(p: PathPat): Seq[PathPat] = {
          val m = p.tail.size
          // length guard FIRST: init/last below throw on an empty tail, and
          // the advisor path probes every plain pattern, bare nodes included
          if (p.pathVar.nonEmpty || m < 4) return Seq(p)
          val innerVars = p.head.v.toSeq ++ p.tail.init.flatMap(_._2.v)
          val last = p.tail.last._2
          val ok =
            p.tail.forall(_._1.range.isEmpty) &&
            p.head.v.isDefined && last.v == p.head.v &&
            last.label.isEmpty && last.extraLabels.isEmpty && last.props.isEmpty &&
            innerVars.distinct.size == innerVars.size // only the one revisit
          if (!ok) return Seq(p)
          val k = m / 2
          val mid = p.tail(k - 1)._2
          val midNamed = if (mid.v.isDefined) mid else mid.copy(v = Some(fresh()))
          def flip(r: RelPat) = r.dir match {
            case graft.graph.Out => r.copy(dir = graft.graph.In)
            case graft.graph.In  => r.copy(dir = graft.graph.Out)
            case _               => r
          }
          val arm1 = PathPat(p.head,
            p.tail.take(k).updated(k - 1, (p.tail(k - 1)._1, midNamed)))
          // the second arm walks the remaining hops BACKWARDS from the
          // revisited anchor to the midpoint (directions flipped, node
          // patterns keep their labels/props/filters)
          val arm2 = PathPat(p.head, ((k + 1) to m).reverse.map { j =>
            (flip(p.tail(j - 1)._1),
              if (j - 1 == k) midNamed else p.tail(j - 2)._2)
          })
          Seq(arm1, arm2)
        }
        // `true` = always split; `auto` = probe translation notes the
        // qualifying patterns, the session consults the advisor's cost
        // model (CycleAdvisor.autoDecide) and re-translates under
        // withForced when the margin holds — the forced set carries the
        // WINNING hop counts, so a multi-pattern query splits only the
        // cycles whose own margin cleared (a sub-margin cycle keeps its
        // chain plan); anything else = off (proposal logging only,
        // reference never-auto-leapfrog parity)
        val forcedHops = CycleAdvisor.forcedHops
        val cycleSplitOn =
          org.apache.spark.sql.SparkSession.getActiveSession
            .exists(_.conf.getOption("spark.graft.cypher.cycleSplit")
              .contains("true"))
        val plainPaths = paths.filter(_.shortest.isEmpty)
        val effPaths =
          if (cycleSplitOn) plainPaths.flatMap(splitCycle)
          else if (forcedHops.nonEmpty) plainPaths.flatMap { p =>
            val s = splitCycle(p)
            if (s.size == 2 && forcedHops.contains(p.tail.size)) s else Seq(p)
          }
          else {
            // flag off/auto, probe pass: note patterns that WOULD split so
            // the advisor can propose (off) or decide (auto) — no plan
            // change in this translation
            plainPaths.foreach(p =>
              if (splitCycle(p).size == 2) CycleAdvisor.noteQualifying(p.tail.size))
            plainPaths
          }

        for (path <- effPaths) {
          val nodeVars = (path.head.v.toSeq ++ path.tail.flatMap(_._2.v)).toSet
          path.tail.flatMap(_._1.v).foreach { ev =>
            require(!nodeVars.contains(ev),
              s"'$ev' is used as both a node and a relationship variable")
          }
          nodeVars.foreach { nv =>
            require(!boundEdgeVars.contains(nv),
              s"'$nv' is already bound as a relationship variable and cannot re-bind as a node")
            boundVars += nv
          }
          val headVar = path.head.v.getOrElse(fresh())
          var pathOp: Op.T = Op.NodeScan(headVar, path.head.label)
          pathOp = nodeFilters(pathOp, headVar, path.head)
          var fromVar = headVar
          // `p = (…)` on an ordinary pattern: length(p) = fixed rel count
          // (+ the single var-length walk's hop column when present)
          val nVarLen = path.tail.count(_._1.range.isDefined)
          val hopsCol: Option[String] = path.pathVar.flatMap { pv =>
            require(nVarLen <= 1,
              "path variables support at most one var-length relationship per path")
            val nFixed = path.tail.size - nVarLen
            if (nVarLen == 1) {
              val c = s"__plen_$pv"
              pathLenExprs(pv) =
                if (nFixed == 0) Expr.Var(c)
                else Expr.Bin("+", Expr.Var(c), Expr.Lit(nFixed.toLong))
              Some(c)
            } else {
              pathLenExprs(pv) = Expr.Lit(path.tail.size.toLong)
              None
            }
          }
          val pathCol: Option[String] = path.pathVar.filter(wantsPathNodes.contains).map { pv =>
            require(nVarLen == 1 && path.tail.size == 1,
              "nodes(p)/relationships(p) need a single var-length relationship pattern")
            val c = s"__pnodes_$pv"
            pathNodeCols(pv) = c
            c
          }
          // cyclic patterns: a node var reused later in the SAME path (e.g.
          // MATCH (a)-[:X]->(b)-[:Y]->(a)) expands into a fresh column plus a
          // join-back equality filter — correct cycle semantics instead of a
          // duplicate-column AnalysisException (ref cypher_translator.rs
          // rebinds through its binding table).
          val seenInPath = scala.collection.mutable.Set(headVar)
          for ((rel, node) <- path.tail) {
            val rebindOf = node.v.filter(seenInPath.contains)
            val toVar = if (rebindOf.isDefined) fresh() else node.v.getOrElse(fresh())
            pathOp = rel.range match {
              case Some((lo, hi)) =>
                require(rel.v.isEmpty,
                  "edge variables on var-length patterns are not supported (the walk has no single edge)")
                Op.VarExpand(pathOp, fromVar, rel.relTypes, toVar, rel.dir, lo, hi,
                  node.label, hopsCol, pathCol, uniq = "edges")
              case None =>
                val evUse = rel.v.map { ev =>
                  if (boundEdgeVars.contains(ev)) {
                    require(!optional,
                      s"relationship variable '$ev' cannot be re-bound inside OPTIONAL MATCH")
                    val f = fresh()
                    edgeRebinds += ((f, ev))
                    f
                  } else {
                    require(!boundVars.contains(ev),
                      s"'$ev' is already bound as a node variable and cannot re-bind as a relationship")
                    boundVars += ev; boundEdgeVars += ev; ev
                  }
                }
                Op.Expand(pathOp, fromVar, rel.relTypes, toVar, rel.dir, node.label,
                  evUse)
            }
            rebindOf.foreach(orig => pathOp = Op.Filter(pathOp,
              Expr.Bin("=", Expr.Var(toVar), Expr.Var(orig))))
            pathOp = nodeFilters(pathOp, toVar, node)
            seenInPath += toVar
            fromVar = toVar
          }
          matchOp = Some(matchOp.map(Op.NaturalJoin(_, pathOp)).getOrElse(pathOp))
        }
        // WHERE inside OPTIONAL MATCH applies before the left join (openCypher)
        var rhs = matchOp.get
        if (optional) {
          where.foreach(w => rhs = applyWhere(rhs, w))
          cur = if (cur == Op.OneRow) rhs else Op.LeftNaturalJoin(cur, rhs)
        } else {
          cur = if (cur == Op.OneRow) rhs else Op.NaturalJoin(cur, rhs)
          // edge-identity joins for reused relationship variables — after the
          // clause join (the original binding may be in an earlier clause),
          // before the user's WHERE
          edgeRebinds.foreach { case (f, orig) =>
            cur = Op.Filter(cur,
              Expr.Bin("=", Expr.Prop(f, "eid"), Expr.Prop(orig, "eid")))
          }
          where.foreach(w => cur = applyWhere(cur, w))
        }

      case UnwindClause(list, as) =>
        cur = Op.Unwind(cur, list, as)

      case _: CreateClause | _: SetClause | _: DeleteClause | _: MergeClause |
          _: RemoveClause | _: RemovePropClause =>
        throw new IllegalArgumentException(
          "mutation clauses run through GraftSession.cypherUpdate, not cypher()")

      case WithRet(items, distinct, where, orderBy, skip, limit, _) =>
        val named = items.map { case (e, alias) =>
          val (cur2, e2) = extractCounts(cur, e)
          cur = cur2
          (e2, alias.getOrElse(defaultName(e)))
        }
        val hasAgg = named.exists { case (e, _) => Expr.containsAggregate(e) }
        cur =
          if (hasAgg) {
            val (aggs, keys) = named.partition { case (e, _) => Expr.containsAggregate(e) }
            val agg = Op.Aggregate(cur, keys, aggs)
            // restore the declared column order
            Op.Project(agg, named.map { case (_, n) => (Expr.Var(n): Expr.E, n) })
          } else Op.Project(cur, named)
        where.foreach(w => cur = applyWhere(cur, w))
        if (distinct) cur = Op.Distinct(cur)
        if (orderBy.nonEmpty) {
          // resolve ORDER BY expressions that textually match a returned item
          val resolved = orderBy.map { case (e, asc) =>
            named.find(_._1 == e).map { case (_, n) => (Expr.Var(n): Expr.E, asc) }
              .getOrElse((e, asc))
          }
          cur = Op.Sort(cur, resolved)
        }
        skip.foreach(n => cur = Op.Skip(cur, n))
        limit.foreach(n => cur = Op.Limit(cur, n))
    }
    if (pathLenExprs.isEmpty && pathNodeCols.isEmpty) cur
    else Op.rewriteExprs(cur) {
      case Expr.Func(n, Seq(Expr.Var(pv)), _)
          if n.equalsIgnoreCase("length") && pathLenExprs.contains(pv) =>
        pathLenExprs(pv)
      case Expr.Func(n, Seq(Expr.Var(pv)), _)
          if n.equalsIgnoreCase("nodes") && pathNodeCols.contains(pv) =>
        Expr.Var(pathNodeCols(pv))
      case Expr.Func(n, Seq(Expr.Var(pv)), _)
          if n.equalsIgnoreCase("relationships") && pathNodeCols.contains(pv) =>
        Expr.Func("__path_rels", Seq(Expr.Var(pathNodeCols(pv))))
      case e => e
    }
  }

  /** Bind `$name` parameters to literal values (reference
    * processor.rs:417-600 — substitution before planning, so Catalyst sees
    * plain literals and constant-folds/pushes them down).
    */
  def bindParams(op: Op.T, params: Map[String, Any]): Op.T =
    Op.rewriteExprs(op) {
      case Expr.Param(n) =>
        Expr.Lit(params.getOrElse(n,
          throw new IllegalArgumentException(s"missing parameter: $$$n")))
      case e => e
    }

  private def propFilters(op: Op.T, v: String, props: Seq[(String, Expr.E)]): Op.T =
    props.foldLeft(op) { case (acc, (k, value)) =>
      Op.Filter(acc, Expr.Bin("=", Expr.Prop(v, k), value))
    }

  /** Multi-label conjunction `(n:A:B)`: the primary label rides the scan;
    * each extra one becomes a hasLabel() filter Catalyst pushes into it. */
  private def nodeFilters(op: Op.T, v: String, node: NodePat): Op.T =
    propFilters(
      node.extraLabels.foldLeft(op) { (acc, l) =>
        Op.Filter(acc, Expr.Func("hasLabel", Seq(Expr.Var(v), Expr.Lit(l))))
      }, v, node.props)

  private def defaultName(e: Expr.E): String = e match {
    case Expr.Var(n)     => n
    case Expr.Prop(v, k) => s"${v}_$k"
    case Expr.Func(n, _, _) => n.toLowerCase
    case _ => "expr"
  }
}
