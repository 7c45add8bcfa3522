package graft.frontends.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.{L, LocalGraph, Term, TripleGraph, TriplePattern, V}
import graft.ir.Expr

/** SPARQL 1.1 front-end (SURVEY §2.8; reference
  * crates/grafeo-adapters/src/query/sparql_translator.rs + RDF planning
  * planner_rdf.rs). Supported subset:
  *
  *   SELECT [DISTINCT] ?v … (AGG(?v) AS ?alias) …
  *   WHERE { triples . FILTER(e) OPTIONAL{…} {…} UNION {…} MINUS{…}
  *           BIND(e AS ?v) }
  *   [GROUP BY ?v …] [ORDER BY [ASC|DESC](?v) …] [OFFSET n] [LIMIT n]
  *
  * Terms: ?var, <iri>, 'literal' / "literal", bare prefixed names (our
  * triple store holds plain strings). Compiles to DataFrame algebra over the
  * triples table: BGP = filtered self-joins, OPTIONAL = left outer join,
  * UNION = unionByName(allowMissing), MINUS = left anti join — one column
  * per variable throughout.
  */
object SparqlLexer {
  sealed trait Tok
  final case class VarT(name: String) extends Tok
  final case class Word(s: String) extends Tok    // bare name / prefixed name
  final case class Kw(s: String) extends Tok      // reserved, uppercased
  final case class StrT(s: String) extends Tok
  final case class NumT(s: String) extends Tok
  final case class Sym(s: String) extends Tok

  private val keywords = Set("SELECT", "ASK", "CONSTRUCT", "DESCRIBE", "WHERE", "DISTINCT", "FILTER",
    "OPTIONAL", "UNION", "MINUS", "BIND", "AS", "GROUP", "BY", "ORDER",
    "ASC", "DESC", "LIMIT", "OFFSET", "COUNT", "SUM", "AVG", "MIN", "MAX",
    "A", "TRUE", "FALSE")

  def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '?' || c == '$') {
        val start = i + 1
        i += 1
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        out += VarT(q.substring(start, i))
      } else if (c == '<') {
        // '<' is an IRI opener OR the less-than operator. Found by the r16
        // parser fuzz: the unconditional IRI branch swallowed everything up
        // to the next '>' (FILTER(?a <= 5 && ?b > 3) lexed "= 5 && ?b " as
        // an IRI), so any </<= comparison mis-parsed. Disambiguate like the
        // SPARQL grammar's IRIREF production: '<…>' is an IRI only when the
        // body contains none of the characters IRIREF excludes (whitespace,
        // nested '<', '"', '{', '}', '|', '^', '`', '\') AND does not start
        // with '?'/'$' — a variable can never open an IRI, which covers
        // space-free operator chains like FILTER(?x<?y&&?z>5) whose body
        // '?y&&?z' passes the character screen (ADVICE r16). '<=' and
        // everything else is the operator.
        val end = q.indexOf('>', i)
        val body = if (end > 0) q.substring(i + 1, end) else ""
        val irirefExcluded: Char => Boolean =
          ch => ch.isWhitespace || "<\"{}|^`\\".contains(ch)
        if (i + 1 < n && q(i + 1) == '=') { out += Sym("<="); i += 2 }
        else if (end > 0 && !body.exists(irirefExcluded) &&
            !body.headOption.exists(h => h == '?' || h == '$')) {
          out += Word(body)
          i = end + 1
        } else { out += Sym("<"); i += 1 }
      } else if (c == '\'' || c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && q(i) != c) {
          if (q(i) == '\\') i = graft.frontends.Lexing.readEscape(q, i, sb)
          else { sb += q(i); i += 1 }
        }
        i += 1
        out += StrT(sb.toString)
      } else if (c.isDigit || (c == '-' && i + 1 < n && q(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (q(i).isDigit || q(i) == '.')) i += 1
        out += NumT(q.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_' || q(i) == ':')) i += 1
        val w = q.substring(start, i)
        if (keywords.contains(w.toUpperCase) && !w.contains(':')) out += Kw(w.toUpperCase)
        else out += Word(w)
      } else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (Set("<=", ">=", "!=", "&&", "||").contains(two)) { out += Sym(two); i += 2 }
        else { out += Sym(c.toString); i += 1 }
      }
    }
    out.result()
  }
}

object SparqlAst {
  /** SPARQL 1.1 property-path expressions (ref sparql/ast.rs:388-414). */
  sealed trait PathE
  final case class PLink(p: String) extends PathE
  final case class PInv(e: PathE) extends PathE          // ^p
  final case class PSeq(l: PathE, r: PathE) extends PathE // p1/p2
  final case class PAlt(l: PathE, r: PathE) extends PathE // p1|p2
  final case class PClosure(e: PathE, minZero: Boolean) extends PathE // p+ / p*
  final case class POpt(e: PathE) extends PathE          // p?
  /** Negated property set `!p` / `!(p1|^p2|…)` (ref sparql/ast.rs:388-414).
    * Forward members exclude predicates on (s,o); inverse members exclude
    * predicates on reversed (o,s); mixed sets are the union of both parts.
    */
  final case class PNeg(fwd: Seq[String], inv: Seq[String]) extends PathE

  sealed trait Pattern
  final case class Bgp(triples: Seq[TriplePattern]) extends Pattern
  /** A triple whose predicate is a path expression. */
  final case class PathP(s: Term, path: PathE, o: Term) extends Pattern
  final case class Join(l: Pattern, r: Pattern) extends Pattern
  final case class LeftJoin(l: Pattern, r: Pattern) extends Pattern
  final case class UnionP(l: Pattern, r: Pattern) extends Pattern
  final case class MinusP(l: Pattern, r: Pattern) extends Pattern
  final case class FilterP(p: Pattern, e: Expr.E) extends Pattern
  final case class BindP(p: Pattern, e: Expr.E, as: String) extends Pattern
  /** FILTER [NOT] EXISTS { … } → semi/anti join on shared vars. */
  final case class ExistsP(p: Pattern, sub: Pattern, negated: Boolean) extends Pattern
  /** Nested `{ SELECT … }` subquery (ref sparql/ast.rs:321-322) — evaluated
    * as its own query, joined with the enclosing group on shared variables.
    */
  final case class SubSelectP(q: Query) extends Pattern
  /** VALUES ?v { lit … } / VALUES (?a ?b) { (l1 l2) … } → inline bindings. */
  final case class ValuesP(p: Pattern, vars: Seq[String], rows: Seq[Seq[String]]) extends Pattern
  /** GRAPH g { … } (SPARQL 1.1 §13.3; reference TripleScanOp graph field,
    * plan.rs:489): a constant name scopes the body to one named graph; a
    * variable additionally binds the graph name per solution.
    */
  final case class GraphP(name: Term, inner: Pattern) extends Pattern

  final case class Query(
      kind: String,                     // select | ask | construct | describe
      items: Seq[(Expr.E, String)],     // projection in declared order
      constructTpl: Seq[TriplePattern], // for CONSTRUCT
      distinct: Boolean,
      where: Pattern,
      groupBy: Seq[String],
      orderBy: Seq[(String, Boolean)],
      offset: Option[Long],
      limit: Option[Long])
}

final class SparqlParser(tokens: Vector[SparqlLexer.Tok]) {
  import SparqlAst._
  import SparqlLexer._

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
    throw new IllegalArgumentException(s"sparql parse error at token $pos: $msg")

  def parseQuery(): Query = {
    val kind = next() match {
      case Kw("SELECT") => "select"
      case Kw("ASK") => "ask"
      case Kw("CONSTRUCT") => "construct"
      case Kw("DESCRIBE") => "describe"
      case other => fail(s"expected SELECT/ASK/CONSTRUCT/DESCRIBE, got $other")
    }
    val constructTpl = Seq.newBuilder[TriplePattern]
    if (kind == "construct") {
      expect(Sym("{"))
      while (!at(Sym("}"))) {
        if (at(Sym("."))) { next() }
        else constructTpl += TriplePattern(parseTerm(), parseTerm(), parseTerm())
      }
      expect(Sym("}"))
    }
    val distinct = kind == "select" && eat(Kw("DISTINCT"))
    val items = Seq.newBuilder[(Expr.E, String)]
    if (kind == "describe") {
      // DESCRIBE targets: IRIs (literal resources) and/or variables bound
      // by the WHERE pattern (ref sparql/ast.rs:233 DescribeQuery)
      var go2 = true
      while (go2) peek match {
        case Some(VarT(v)) => next(); items += ((Expr.Var(v), v))
        case Some(Word(w)) => next(); items += ((Expr.Lit(w), w))
        case _ => go2 = false
      }
    }
    var go = kind == "select"
    while (go) peek match {
      case Some(VarT(v)) => next(); items += ((Expr.Var(v), v))
      case Some(Sym("*")) => next() // * = all vars; resolved at compile
      case Some(Sym("(")) =>
        next()
        val e = parseExpr()
        expect(Kw("AS"))
        val alias = next() match {
          case VarT(v) => v
          case other => fail(s"expected ?alias, got $other")
        }
        expect(Sym(")"))
        items += ((e, alias))
      case _ => go = false
    }
    // WHERE is optional for DESCRIBE <iri>
    val where =
      if (kind == "describe" && !at(Kw("WHERE"))) Bgp(Nil)
      else { expect(Kw("WHERE")); parseGroup() }
    val groupBy = Seq.newBuilder[String]
    if (eat(Kw("GROUP"))) {
      expect(Kw("BY"))
      var g2 = true
      while (g2) peek match {
        case Some(VarT(v)) => next(); groupBy += v
        case _ => g2 = false
      }
    }
    val orderBy = Seq.newBuilder[(String, Boolean)]
    if (eat(Kw("ORDER"))) {
      expect(Kw("BY"))
      var g3 = true
      while (g3) peek match {
        case Some(VarT(v)) => next(); orderBy += ((v, true))
        case Some(Kw(d @ ("ASC" | "DESC"))) =>
          next(); expect(Sym("("))
          val v = next() match {
            case VarT(x) => x
            case other => fail(s"expected var, got $other")
          }
          expect(Sym(")"))
          orderBy += ((v, d == "ASC"))
        case _ => g3 = false
      }
    }
    var offset: Option[Long] = None
    var limit: Option[Long] = None
    var more = true
    while (more) peek match {
      case Some(Kw("OFFSET")) => next(); offset = Some(parseNum())
      case Some(Kw("LIMIT"))  => next(); limit = Some(parseNum())
      // stop on anything else: a subselect's enclosing `}` follows; the
      // top-level entry point enforces EOF via ensureEof()
      case _ => more = false
    }
    Query(kind, items.result(), constructTpl.result(), distinct, where,
      groupBy.result(), orderBy.result(), offset, limit)
  }

  def ensureEof(): Unit =
    peek.foreach(t => fail(s"trailing tokens: $t"))

  private def parseNum(): Long = next() match {
    case NumT(s) => s.toLong
    case other => fail(s"expected number, got $other")
  }

  private def parseGroup(): Pattern = {
    expect(Sym("{"))
    var acc: Option[Pattern] = None
    var bgp = Seq.newBuilder[TriplePattern]
    def flushBgp(): Unit = {
      val ts = bgp.result()
      if (ts.nonEmpty) {
        acc = Some(acc.map(a => Join(a, Bgp(ts))).getOrElse(Bgp(ts)))
        bgp = Seq.newBuilder[TriplePattern]
      }
    }
    while (!at(Sym("}"))) {
      peek match {
        case Some(Kw("FILTER")) =>
          next(); flushBgp()
          // FILTER [NOT] EXISTS { … } (SPARQL 1.1 §8.1) before expression forms
          def isWord(t: Option[Tok], s: String): Boolean = t match {
            case Some(Word(w)) => w.equalsIgnoreCase(s)
            case _ => false
          }
          val save = pos
          val negated = isWord(peek, "NOT")
          if (negated) next()
          if (isWord(peek, "EXISTS")) {
            next()
            val sub = parseGroup()
            acc = Some(ExistsP(acc.getOrElse(Bgp(Nil)), sub, negated))
          } else {
            pos = save
            val e = if (at(Sym("("))) { next(); val x = parseExpr(); expect(Sym(")")); x }
            else parseExpr() // bare function call form: FILTER f(args)
            acc = Some(FilterP(acc.getOrElse(Bgp(Nil)), e))
          }
        case Some(Word(w)) if w.equalsIgnoreCase("VALUES") =>
          next(); flushBgp()
          val vars = Seq.newBuilder[String]
          val single = peek match {
            case Some(VarT(v)) => next(); vars += v; true
            case Some(Sym("(")) =>
              next()
              while (!at(Sym(")"))) peek match {
                case Some(VarT(v)) => next(); vars += v
                case other => fail(s"VALUES expects variables, got $other")
              }
              next(); false
            case other => fail(s"VALUES expects ?var or (?vars), got $other")
          }
          expect(Sym("{"))
          val rows = Seq.newBuilder[Seq[String]]
          def litTok(): String = next() match {
            case Word(s2) => s2
            case StrT(s2) => s2
            case NumT(s2) => s2
            case other => fail(s"VALUES expects literals, got $other")
          }
          while (!at(Sym("}"))) {
            if (single) rows += Seq(litTok())
            else {
              expect(Sym("("))
              val r = Seq.newBuilder[String]
              while (!at(Sym(")"))) r += litTok()
              next()
              rows += r.result()
            }
          }
          next()
          acc = Some(ValuesP(acc.getOrElse(Bgp(Nil)), vars.result(), rows.result()))
        case Some(Word(w)) if w.equalsIgnoreCase("SERVICE") =>
          // SPARQL 1.1 Federated Query (ref sparql/ast.rs:325). The
          // reference evaluates the inner pattern against the LOCAL store
          // and ignores the endpoint (sparql_translator.rs:673-680); we
          // grant that semantics only under SERVICE SILENT — the form
          // whose spec meaning is "errors are not fatal", so local
          // evaluation is a conforming degradation. A loud (non-SILENT)
          // SERVICE keeps the specific rejection: this deployment has no
          // egress to federate to, and silently answering from local data
          // would misrepresent a remote query's result.
          next(); flushBgp()
          val silent = peek match {
            case Some(Word(s)) if s.equalsIgnoreCase("SILENT") => next(); true
            case _ => false
          }
          val _endpoint = parseTerm() // parsed, deliberately unused (local eval)
          if (!silent)
            fail("SPARQL SERVICE (federated query) is not supported in this " +
              "deployment; SERVICE SILENT evaluates the pattern locally")
          val inner = parseGroup()
          acc = Some(acc.map(a => Join(a, inner): Pattern).getOrElse(inner))
        case Some(Word(w)) if w.equalsIgnoreCase("GRAPH") =>
          next(); flushBgp()
          val t = parseTerm()
          val inner = parseGroup()
          acc = Some(acc.map(a => Join(a, GraphP(t, inner)): Pattern)
            .getOrElse(GraphP(t, inner)))
        case Some(Kw("OPTIONAL")) =>
          next(); flushBgp()
          val r = parseGroup()
          acc = Some(LeftJoin(acc.getOrElse(Bgp(Nil)), r))
        case Some(Kw("MINUS")) =>
          next(); flushBgp()
          val r = parseGroup()
          acc = Some(MinusP(acc.getOrElse(Bgp(Nil)), r))
        case Some(Kw("BIND")) =>
          next(); flushBgp()
          expect(Sym("("))
          val e = parseExpr()
          expect(Kw("AS"))
          val v = next() match {
            case VarT(x) => x
            case other => fail(s"expected ?var, got $other")
          }
          expect(Sym(")"))
          acc = Some(BindP(acc.getOrElse(Bgp(Nil)), e, v))
        case Some(Sym("{")) if tokens.lift(pos + 1).contains(Kw("SELECT")) =>
          // nested SELECT subquery (ref sparql/ast.rs:321-322)
          flushBgp()
          next()
          val sq = parseQuery()
          expect(Sym("}"))
          acc = Some(acc.map(a => Join(a, SubSelectP(sq)): Pattern)
            .getOrElse(SubSelectP(sq)))
        case Some(Sym("{")) =>
          flushBgp()
          var g = parseGroup()
          while (eat(Kw("UNION"))) g = UnionP(g, parseGroup())
          acc = Some(acc.map(a => Join(a, g)).getOrElse(g))
        case Some(Sym(".")) => next()
        case _ =>
          val s = parseTerm()
          parsePredicate() match {
            case Left(p) =>
              val o = parseTerm()
              bgp += TriplePattern(s, p, o)
            case Right(path) =>
              val o = parseTerm()
              flushBgp()
              acc = Some(acc.map(a => Join(a, PathP(s, path, o)))
                .getOrElse(PathP(s, path, o)))
          }
      }
    }
    expect(Sym("}"))
    flushBgp()
    acc.getOrElse(Bgp(Nil))
  }

  private def parseTerm(): Term = next() match {
    case VarT(v)  => V(v)
    case Word(w)  => L(w)
    case StrT(s2) => L(s2)
    case NumT(s2) => L(s2)
    case other => fail(s"expected term, got $other")
  }

  /** Predicate position: a variable, a plain predicate, or a property path
    * (ref sparql/ast.rs:388-414). Precedence: `|` < `/` < unary `^` <
    * postfix `* + ?`. NOTE: a lone `?` lexes as an empty variable token
    * (VarT("")), which only occurs as the optional-path postfix.
    */
  private def parsePredicate(): Either[Term, PathE] = peek match {
    case Some(VarT(v)) if v.nonEmpty => next(); Left(V(v))
    case _ => parsePathAlt() match {
      case PLink(w) => Left(L(w)) // no operators → plain triple pattern
      case path     => Right(path)
    }
  }

  private def parsePathAlt(): PathE = {
    var e = parsePathSeq()
    while (eat(Sym("|"))) e = PAlt(e, parsePathSeq())
    e
  }
  private def parsePathSeq(): PathE = {
    var e = parsePathUnary()
    while (eat(Sym("/"))) e = PSeq(e, parsePathUnary())
    e
  }
  private def parsePathUnary(): PathE = {
    val inv = eat(Sym("^"))
    var e = peek match {
      case Some(Sym("!")) => next(); parseNegatedSet()
      case Some(Sym("(")) => next(); val x = parsePathAlt(); expect(Sym(")")); x
      case Some(Kw("A")) => next(); PLink("rdf:type") // `a` keyword
      case Some(Word(w))  => next(); PLink(w)
      case other => fail(s"expected path element, got $other")
    }
    var go = true
    while (go) peek match {
      case Some(Sym("*"))  => next(); e = PClosure(e, minZero = true)
      case Some(Sym("+"))  => next(); e = PClosure(e, minZero = false)
      case Some(VarT("")) => next(); e = POpt(e) // `?` postfix (see note)
      case _ => go = false
    }
    if (inv) PInv(e) else e
  }

  /** `!p`, `!^p`, or `!(p1|^p2|…)` — members are plain IRIs, optionally
    * `^`-inverted; `a` is allowed as a member and means rdf:type.
    */
  private def parseNegatedSet(): PathE = {
    val fwd = Seq.newBuilder[String]
    val inv = Seq.newBuilder[String]
    def member(): Unit = {
      val isInv = eat(Sym("^"))
      val w = peek match {
        case Some(Kw("A"))   => next(); "rdf:type"
        case Some(Word(x))   => next(); x
        case other => fail(s"expected IRI in negated property set, got $other")
      }
      if (isInv) inv += w else fwd += w
    }
    if (eat(Sym("("))) {
      member()
      while (eat(Sym("|"))) member()
      expect(Sym(")"))
    } else member()
    SparqlAst.PNeg(fwd.result(), inv.result())
  }

  // ---- FILTER / BIND expressions ----
  def parseExpr(): Expr.E = parseOr()
  private def parseOr(): Expr.E = {
    var e = parseAnd()
    while (eat(SparqlLexer.Sym("||"))) e = Expr.Bin("or", e, parseAnd())
    e
  }
  private def parseAnd(): Expr.E = {
    var e = parseNot()
    while (eat(SparqlLexer.Sym("&&"))) e = Expr.Bin("and", e, parseNot())
    e
  }
  private def parseNot(): Expr.E =
    if (eat(SparqlLexer.Sym("!"))) Expr.Not(parseNot()) else parseCmp()
  private def parseCmp(): Expr.E = {
    var e = parseAdd()
    peek match {
      case Some(Sym(op @ ("=" | "!=" | "<" | "<=" | ">" | ">="))) =>
        next()
        val norm = if (op == "!=") "<>" else op
        e = Expr.Bin(norm, e, parseAdd())
      case _ =>
    }
    e
  }
  private def parseAdd(): Expr.E = {
    var e = parseMul()
    var go = true
    while (go) peek match {
      case Some(Sym(op @ ("+" | "-"))) => next(); e = Expr.Bin(op, e, parseMul())
      case _ => go = false
    }
    e
  }
  private def parseMul(): Expr.E = {
    var e = parseAtom()
    var go = true
    while (go) peek match {
      case Some(Sym(op @ ("*" | "/"))) => next(); e = Expr.Bin(op, e, parseAtom())
      case _ => go = false
    }
    e
  }
  private def parseAtom(): Expr.E = next() match {
    case VarT(v)  => Expr.Var(v)
    case StrT(s2) => Expr.Lit(s2)
    case NumT(s2) =>
      if (s2.contains('.')) Expr.Lit(s2.toDouble) else Expr.Lit(s2.toLong)
    case Kw("TRUE")  => Expr.Lit(true)
    case Kw("FALSE") => Expr.Lit(false)
    case Sym("(") => val e = parseExpr(); expect(Sym(")")); e
    case Word(f) if at(Sym("(")) =>
      next()
      val args = Seq.newBuilder[Expr.E]
      if (!at(Sym(")"))) { args += parseExpr(); while (eat(Sym(","))) args += parseExpr() }
      expect(Sym(")"))
      Expr.Func(f, args.result())
    case Kw(agg @ ("COUNT" | "SUM" | "AVG" | "MIN" | "MAX")) =>
      expect(Sym("("))
      val distinct = eat(Kw("DISTINCT"))
      val arg = if (eat(Sym("*"))) Expr.Lit("*") else parseExpr()
      expect(Sym(")"))
      Expr.Func(agg.toLowerCase, Seq(arg), distinct)
    case Word(w) => Expr.Lit(w)
    case other => fail(s"unexpected token in expression: $other")
  }
}

/** Pattern algebra + expression compiler over the triples DataFrame. */
final class SparqlCompiler(graph: TripleGraph,
    quads: Option[graft.graph.QuadStore] = None,
    graphVar: Option[String] = None) {
  import SparqlAst._

  def compile(q: Query): DataFrame = {
    if (q.kind == "ask") {
      // ASK: any solution exists (plan.rs ask handling in planner_rdf)
      return compilePattern(q.where).limit(1)
        .agg((count(lit(1)) > 0).as("ask"))
    }
    if (q.kind == "describe") {
      // DESCRIBE (ref sparql/ast.rs:233): all triples whose subject is a
      // described resource — literal IRIs plus every binding of the DESCRIBE
      // variables in the WHERE pattern. A left-semi join keeps the scan
      // streaming (no collect of the resource set).
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val spark = graph.triples.sparkSession
      val vars = q.items.collect { case (Expr.Var(v), _) => v }
      val iris = q.items.collect { case (Expr.Lit(s), _) => s.toString }
      require(vars.nonEmpty || iris.nonEmpty, "DESCRIBE needs a resource or variable")
      val fromVars = if (vars.isEmpty) None else {
        val b = compilePattern(q.where)
        Some(vars.map(v => b.select(col(v).cast("string").as("__r")))
          .reduce(_ unionByName _))
      }
      val fromIris = if (iris.isEmpty) None else
        Some(spark.createDataFrame(
          java.util.Arrays.asList(iris.map(Row(_)): _*),
          StructType(Seq(StructField("__r", StringType)))))
      val resources = (fromVars.toSeq ++ fromIris.toSeq).reduce(_ unionByName _)
      return graph.triples
        .join(resources.distinct(), col("s") === col("__r"), "left_semi")
        .select("s", "p", "o").distinct()
    }
    if (q.kind == "construct") {
      val bindings = compilePattern(q.where)
      def term(t: graft.graph.Term): org.apache.spark.sql.Column = t match {
        case graft.graph.V(n) => col(n).cast("string")
        case graft.graph.L(v) => lit(v)
      }
      return q.constructTpl
        .map(t => bindings.select(term(t.s).as("s"), term(t.p).as("p"), term(t.o).as("o")))
        .reduce(_ unionByName _)
        .distinct()
    }
    var df = compilePattern(q.where)
    val items = if (q.items.isEmpty) df.columns.toSeq.map(c => (Expr.Var(c): Expr.E, c))
      else q.items
    val hasAgg = items.exists { case (e, _) => Expr.containsAggregate(e) }
    df =
      if (hasAgg || q.groupBy.nonEmpty) {
        val keys = q.groupBy.map(v => col(v))
        val aggs = items.filter { case (e, _) => Expr.containsAggregate(e) }
          .map { case (e, n) => aggExpr(e).as(n) }
        val grouped =
          if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
          else df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
        grouped.select(items.map { case (_, n) => col(n) }: _*)
      } else df.select(items.map { case (e, n) => expr(e).as(n) }: _*)
    if (q.distinct) df = df.distinct()
    if (q.orderBy.nonEmpty)
      df = df.orderBy(q.orderBy.map { case (v, asc) =>
        if (asc) col(v).asc_nulls_first else col(v).desc_nulls_last }: _*)
    q.offset.foreach(n => df = df.offset(n.toInt))
    q.limit.foreach(n => df = df.limit(n.toInt))
    df
  }

  def compilePattern(p: Pattern): DataFrame = p match {
    case Bgp(Nil)     => graph.triples.sparkSession.range(1).select(lit(1).as("__one"))
    // inside GRAPH ?var scope every BGP leg carries the graph binding, so
    // composed patterns (FILTER/OPTIONAL/UNION/MINUS) stay same-graph via
    // the natural join on the variable (SPARQL 1.1 §13.3)
    case Bgp(ts)      => graphVar match {
      case Some(gv) => quads.get.bgp(gv, ts)
      case None     => graph.bgp(ts)
    }
    case GraphP(name, inner) =>
      val qs = quads.getOrElse(throw new IllegalArgumentException(
        "GRAPH pattern requires a dataset with named graphs (run with a QuadStore)"))
      name match {
        // constant graph: the body compiles against that graph's triples —
        // the g filter reaches the quad scan (partition pruning shape)
        case L(g) => new SparqlCompiler(qs.graph(g), quads).compilePattern(inner)
        // variable graph: the whole inner group compiles in graph-var
        // scope — every BGP leg binds g, and the natural join on the
        // variable enforces same-graph matching across the block, including
        // through FILTER/OPTIONAL/UNION/MINUS/BIND compositions
        case V(gv) =>
          new SparqlCompiler(graph, quads, Some(gv)).compilePattern(inner)
      }
    case Join(l, r)   => natJoin(compilePattern(l), compilePattern(r), "inner")
    case LeftJoin(l, r) => natJoin(compilePattern(l), compilePattern(r), "left_outer")
    case UnionP(l, r) =>
      val (dl, dr) = (compilePattern(l), compilePattern(r))
      dl.unionByName(dr, allowMissingColumns = true)
    case MinusP(l, r) =>
      val (dl, dr) = (compilePattern(l), compilePattern(r))
      val shared = dl.columns.intersect(dr.columns).toSeq
      if (shared.isEmpty) dl else dl.join(dr.select(shared.map(col): _*).distinct(),
        shared, "left_anti")
    case SubSelectP(sq) => compile(sq)
    case FilterP(in, e) => compilePattern(in).filter(expr(e))
    case BindP(in, e, v) => compilePattern(in).withColumn(v, expr(e))
    case ExistsP(in, sub, negated) =>
      val (dl, dr) = (compilePattern(in), compilePattern(sub))
      val shared = dl.columns.intersect(dr.columns).toSeq
      require(shared.nonEmpty,
        "FILTER EXISTS must share a variable with the outer pattern")
      dl.join(dr.select(shared.map(col): _*).distinct(), shared,
        if (negated) "left_anti" else "left_semi")
    case ValuesP(in, vars, rows) =>
      val spark = graph.triples.sparkSession
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val schema = StructType(vars.map(v => StructField(v, StringType)))
      val vdf = spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r => Row(r: _*)): _*), schema)
      val left = compilePattern(in)
      val shared = left.columns.intersect(vars).toSeq
      if (left.columns.isEmpty || left.columns.sameElements(Array("__one"))) vdf
      else if (shared.nonEmpty) left.join(vdf, shared)
      else left.crossJoin(vdf)
    case PathP(s, path, o) =>
      val seed = s match { case L(v) => Some(v); case _ => None }
      var pairs = pathPairs(path, seed)
      s match { case L(v) => pairs = pairs.filter(col("__ps") === v); case _ => }
      o match { case L(v) => pairs = pairs.filter(col("__po") === v); case _ => }
      (s, o) match {
        case (V(a), V(b)) if a == b =>
          pairs.filter(col("__ps") === col("__po")).select(col("__ps").as(a))
        case (V(a), V(b)) => pairs.select(col("__ps").as(a), col("__po").as(b))
        case (V(a), _)    => pairs.select(col("__ps").as(a))
        case (_, V(b))    => pairs.select(col("__po").as(b))
        case _            => pairs.select() // fully bound: row presence only
      }
  }

  /** Property-path pair sets (columns __ps, __po), ref sparql/ast.rs:388-414.
    * `seed` (a bound subject) restricts closures to frontiers reachable from
    * that term — the difference between one BFS and an all-pairs transitive
    * closure at scale. Arbitrary-length paths (`*`/`+`) have SPARQL set
    * semantics: each reachable pair appears once.
    */
  private def pathPairs(e: SparqlAst.PathE, seed: Option[String]): DataFrame = e match {
    case SparqlAst.PLink(p) =>
      val base = graph.triples.filter(col("p") === p)
        .select(col("s").as("__ps"), col("o").as("__po"))
      seed.map(v => base.filter(col("__ps") === v)).getOrElse(base)
    case SparqlAst.PInv(x) =>
      val sw = pathPairs(x, None)
        .select(col("__po").as("__ps"), col("__ps").as("__po"))
      seed.map(v => sw.filter(col("__ps") === v)).getOrElse(sw)
    case SparqlAst.PNeg(fwd, inv) =>
      // forward part matches any triple whose predicate is outside the
      // forward members; inverse part the same on reversed pairs. Predicate
      // pushdown: the NOT IN reaches the triple scan.
      def fwdPairs = graph.triples.filter(!col("p").isin(fwd: _*))
        .select(col("s").as("__ps"), col("o").as("__po"))
      def invPairs = graph.triples.filter(!col("p").isin(inv: _*))
        .select(col("o").as("__ps"), col("s").as("__po"))
      val base =
        if (inv.isEmpty) fwdPairs
        else if (fwd.isEmpty) invPairs
        else fwdPairs.unionByName(invPairs)
      seed.map(v => base.filter(col("__ps") === v)).getOrElse(base)
    case SparqlAst.PSeq(l, r) =>
      pathPairs(l, seed).withColumnRenamed("__po", "__mid")
        .join(pathPairs(r, None).withColumnRenamed("__ps", "__mid"), "__mid")
        .select("__ps", "__po")
    case SparqlAst.PAlt(l, r) =>
      pathPairs(l, seed).unionByName(pathPairs(r, seed))
    case SparqlAst.POpt(x) =>
      pathPairs(x, seed).unionByName(identityPairs(x, seed)).distinct()
    case SparqlAst.PClosure(x, minZero) =>
      val spark = graph.triples.sparkSession
      val base = pathPairs(x, None).persist()
      // Adaptive strategy: a broadcast-sized base relation runs the whole
      // closure as one job (LocalGraph BFS per seed, seeds distributed);
      // the frontier loop below is the at-scale path.
      LocalGraph.collectIfAtMost(base, LocalGraph.maxEdges(spark)) match {
        case Some(bRows) =>
          val seedPairs = seed match {
            case Some(v) => spark.range(1).select(lit(v).as("__ps"), lit(v).as("__po"))
            case None => base.select(col("__ps")).distinct()
              .select(col("__ps"), col("__ps").as("__po"))
          }
          val reached = LocalGraph.bfs(bRows, seedPairs, Int.MaxValue)
            .select("__ps", "__po")
          base.unpersist(blocking = false)
          // `*` adds each origin's zero-length pair; a cycle can also reach
          // (v,v) at depth >= 1, hence the dedup
          return if (minZero) reached.unionByName(seedPairs).dropDuplicates("__ps", "__po")
            else reached
        case None => ()
      }
      val seeds = seed match {
        case Some(v) => graph.triples.sparkSession.range(1)
          .select(lit(v).as("__ps"), lit(v).as("__po"), lit(0).as("__d"))
        case None => base.select(col("__ps")).distinct()
          .select(col("__ps"), col("__ps").as("__po"), lit(0).as("__d"))
      }
      // frontier BFS with a per-origin visited set. Visited is a buffer of
      // checkpointed frames — the anti-join scans their union, nothing is
      // re-materialized per level (re-checkpointing the whole set each round
      // is O(depth × |closure|) write amplification). Lineage is truncated
      // every `batch` levels rather than every level: intermediate levels
      // chain lazily (identical exchanges collapse under reuse), which cuts
      // the dominant cost of deep closures — one scheduler round-trip per
      // level — by ~batch×, without changing the scale-safe frontier shape.
      // Within a batch, levels chain as plain distinct sets (each level
      // referenced exactly once — no subplan duplication, no per-level
      // anti-join); novelty vs the visited set is settled once per batch by
      // a min-depth aggregation + anti-join. A level may re-contain
      // already-visited pairs (cycles step backwards), which costs bounded
      // re-stepping inside the batch but preserves the BFS frontier
      // invariant: every pair's successors are explored the level after its
      // first discovery.
      val batch = 3
      val step = base.select(col("__ps").as("__from"), col("__po").as("__to"))
      var frames = List(seeds.localCheckpoint())
      var frontier = frames.head.select("__ps", "__po")
      var done = false
      var depth = 0
      while (!done) {
        val visitedAll = frames.map(_.select("__ps", "__po")).reduce(_ unionByName _)
        var levels = List.empty[DataFrame]
        var cur = frontier
        for (k <- 1 to batch) {
          // anti-join per level against the MATERIALIZED pre-batch visited
          // set keeps each level rim-sized (multi-path graphs re-reach old
          // pairs at every length otherwise); referencing checkpointed
          // frames repeatedly is cheap, unlike lazy within-batch levels,
          // whose rediscoveries the batch-end min-__d aggregation absorbs
          cur = cur
            .join(step, col("__po") === col("__from"))
            .select(col("__ps"), col("__to").as("__po"))
            .distinct()
            .join(visitedAll, Seq("__ps", "__po"), "left_anti")
          levels ::= cur.withColumn("__d", lit(depth + k))
        }
        val got = levels.reverse.reduce(_ unionByName _)
          .groupBy(col("__ps"), col("__po")).agg(min(col("__d")).as("__d"))
          .join(visitedAll, Seq("__ps", "__po"), "left_anti")
          .localCheckpoint()
        // one stats scan over the materialized batch replaces a per-level
        // isEmpty action
        val stats = got.agg(count(lit(1)).as("n"), max(col("__d")).as("m")).head()
        if (stats.getLong(0) == 0L) done = true
        else {
          frames ::= got
          frontier = got.filter(col("__d") === stats.getInt(1))
            .select("__ps", "__po")
          depth += batch
        }
      }
      base.unpersist(blocking = false)
      val visited = frames.reduce(_ unionByName _)
      val res = if (minZero) visited else visited.filter(col("__d") >= 1)
      res.select("__ps", "__po")
  }

  /** Zero-length path endpoints: the bound seed itself, or every term that
    * participates in the sub-path's base relation.
    */
  private def identityPairs(x: SparqlAst.PathE, seed: Option[String]): DataFrame =
    seed match {
      case Some(v) => graph.triples.sparkSession.range(1)
        .select(lit(v).as("__ps"), lit(v).as("__po"))
      case None =>
        val b = pathPairs(x, None)
        b.select(col("__ps")).unionByName(b.select(col("__po")))
          .distinct().select(col("__ps"), col("__ps").as("__po"))
    }

  private def natJoin(l: DataFrame, r: DataFrame, how: String): DataFrame = {
    val shared = l.columns.intersect(r.columns).toSeq
    if (shared.nonEmpty) l.join(r, shared, how)
    else if (how == "inner") l.crossJoin(r)
    else l.crossJoin(r) // OPTIONAL with no shared vars = cross (always matches)
  }

  /** SPARQL built-ins (SURVEY §2.5; reference planner_rdf.rs:1927-2350). */
  def expr(e: Expr.E): Column = e match {
    case Expr.Lit(null) => lit(null)
    case Expr.Lit(v)    => lit(v)
    case Expr.Var(n)    => col(n)
    case Expr.Not(x)    => !expr(x)
    case Expr.Neg(x)    => -expr(x)
    case Expr.IsNull(x, neg) => if (neg) expr(x).isNotNull else expr(x).isNull
    case Expr.Bin(op, l, r) =>
      val (cl, cr) = (expr(l), expr(r))
      op match {
        case "+" => cl + cr
        case "-" => cl - cr
        case "*" => cl * cr
        case "/" => cl / cr
        case "=" => cl === cr
        case "<>" => cl =!= cr
        case "<" => cl < cr
        case "<=" => cl <= cr
        case ">" => cl > cr
        case ">=" => cl >= cr
        case "and" => cl && cr
        case "or" => cl || cr
        case other => throw new IllegalArgumentException(s"sparql op $other")
      }
    case Expr.Func(name, args, _) =>
      def a0 = expr(args(0))
      def a1 = expr(args(1))
      name.toUpperCase match {
        case "CONCAT"  => concat(args.map(expr): _*)
        case "REPLACE" => regexp_replace(a0, litString(args(1)), litString(args(2)))
        case "STRLEN"  => length(a0)
        case "UCASE" | "UPPER" => upper(a0)
        case "LCASE" | "LOWER" => lower(a0)
        case "SUBSTR" =>
          if (args.size > 2) substring(a0, litString(args(1)).toInt, litString(args(2)).toInt)
          else a0.substr(a1, length(a0))
        case "STRSTARTS" => a0.startsWith(a1)
        case "STRENDS"   => a0.endsWith(a1)
        case "CONTAINS"  => a0.contains(a1)
        case "STRBEFORE" =>
          when(locate_(a1, a0) > 0, substring(a0, lit(1), locate_(a1, a0) - 1))
            .otherwise(lit(""))
        case "STRAFTER" =>
          when(locate_(a1, a0) > 0,
            a0.substr(locate_(a1, a0) + length(a1), length(a0)))
            .otherwise(lit(""))
        case "ENCODE_FOR_URI" =>
          // url_encode is form-encoding: '+' for space; SPARQL wants %20
          regexp_replace(url_encode(a0), "\\+", "%20")
        case "ABS"   => abs(a0.cast("double"))
        case "CEIL"  => ceil(a0.cast("double"))
        case "FLOOR" => floor(a0.cast("double"))
        case "ROUND" => round(a0.cast("double"))
        case "IF"    => when(a0, a1).otherwise(expr(args(2)))
        case "COALESCE" => coalesce(args.map(expr): _*)
        case "BOUND" => a0.isNotNull
        case "STR"   => lexical(a0.cast("string")) // the lexical form: lang/datatype suffixes stripped
        case "ISNUMERIC" => a0.cast("double").isNotNull
        case "ISIRI" | "ISURI" => a0.rlike("^[a-z]+:")
        case "ISBLANK" => a0.startsWith("_:")
        case "ISLITERAL" => !a0.rlike("^[a-z]+:")
        // --- the remainder of the reference battery (parser.rs:1555-1714) ---
        case "REGEX" =>
          // flags fold into the pattern (`(?i)…`); pattern/flags are literals
          // in practice — runtime patterns go through regexp_like
          (args.lift(1), args.lift(2)) match {
            case (Some(Expr.Lit(p)), None) => a0.rlike(p.toString)
            case (Some(Expr.Lit(p)), Some(Expr.Lit(f))) =>
              a0.rlike(s"(?$f)" + p.toString)
            case _ => call_function("regexp_like", a0, a1)
          }
        case "LANG" => regexp_extract(a0, LangSuffix, 1)
        case "LANGMATCHES" =>
          when(a1 === "*", a0 =!= "").otherwise(
            lower(a0) === lower(a1) ||
              lower(a0).startsWith(concat(lower(a1), lit("-"))))
        case "DATATYPE" =>
          when(regexp_extract(a0, DtSuffix, 1) =!= "", regexp_extract(a0, DtSuffix, 1))
            .when(regexp_extract(a0, LangSuffix, 1) =!= "", lit("rdf:langString"))
            .otherwise(lit("xsd:string"))
        case "STRLANG" => concat(a0, lit("@"), a1)
        case "STRDT"   => concat(a0, lit("^^"), a1)
        case "SAMETERM" => a0 === a1 // encoded term strings compare directly
        case "IRI" | "URI" => a0 // terms are already compact IRIs
        // BNODE(x) is deterministic per label (stable within the solution,
        // the SPARQL contract); BNODE() mints a fresh node per row
        case "BNODE" =>
          if (args.isEmpty) concat(lit("_:"), call_function("uuid"))
          else concat(lit("_:b"), md5(a0.cast("string")))
        case "RAND" => rand()
        case "NOW"  => current_timestamp()
        case "UUID"    => concat(lit("urn:uuid:"), call_function("uuid"))
        case "STRUUID" => call_function("uuid")
        case "MD5"    => md5(a0.cast("string"))
        case "SHA1"   => sha1(a0.cast("string"))
        case "SHA256" => sha2(a0.cast("string"), 256)
        case "SHA384" => sha2(a0.cast("string"), 384)
        case "SHA512" => sha2(a0.cast("string"), 512)
        // xsd:date/dateTime accessors work on the lexical form (ISO 8601
        // casts directly); the typed-literal suffix is stripped first
        case "YEAR"    => year(lexical(a0).cast("timestamp"))
        case "MONTH"   => month(lexical(a0).cast("timestamp"))
        case "DAY"     => dayofmonth(lexical(a0).cast("timestamp"))
        case "HOURS"   => hour(lexical(a0).cast("timestamp"))
        case "MINUTES" => minute(lexical(a0).cast("timestamp"))
        case "SECONDS" => second(lexical(a0).cast("timestamp"))
        case "TIMEZONE" | "TZ" =>
          regexp_extract(lexical(a0), "(Z|[+-][0-9]{2}:[0-9]{2})$", 1)
        // vector extension (reference parser.rs:1610-1615, AI/ML workloads):
        // VECTOR('[…]') parses a bracketed literal into array<float>, the
        // distance/similarity functions reuse the native codegen expressions
        case "VECTOR" =>
          split(regexp_replace(a0, "[\\[\\]\\s]+", ""), ",").cast("array<float>")
        case "COSINE_SIMILARITY" =>
          graft.functions.VectorFunctions.cosineSimilarity(a0, a1)
        case "EUCLIDEAN_DISTANCE" =>
          graft.functions.VectorFunctions.euclideanDistance(a0, a1)
        case "DOT_PRODUCT" =>
          graft.functions.VectorFunctions.dotProduct(a0, a1)
        case "MANHATTAN_DISTANCE" =>
          graft.functions.VectorFunctions.manhattanDistance(a0, a1)
        case other => throw new IllegalArgumentException(s"sparql function $other")
      }
    case other => throw new IllegalArgumentException(s"unsupported sparql expr $other")
  }

  /** Typed-literal encoding (reference RDF terms carry lang/datatype; the
    * string triple store encodes them as suffixes): `"v"@en` → `v@en`,
    * `"v"^^xsd:int` → `v^^xsd:int`. `lexical` strips both suffixes — the
    * STR() view of a term.
    */
  private val LangSuffix = "@([A-Za-z]+(?:-[A-Za-z0-9]+)*)$"
  private val DtSuffix = "\\^\\^([^\\s\"]+)$"
  private def lexical(c: Column): Column =
    regexp_replace(regexp_replace(c, DtSuffix, ""), LangSuffix, "")

  private def locate_(sub: Column, in: Column): Column =
    expr_locate(sub, in)
  private def expr_locate(sub: Column, in: Column): Column =
    call_function("locate", sub, in)

  private def aggExpr(e: Expr.E): Column = e match {
    case Expr.Func(n, args, distinct)
        if Expr.aggregateFns.contains(n.toLowerCase) =>
      def a0 = expr(args.head)
      n.toLowerCase match {
        case "count" =>
          if (args.head == Expr.Lit("*")) count(lit(1))
          else if (distinct) countDistinct(a0) else count(a0)
        case "sum" => sum(a0.cast("double"))
        case "avg" => avg(a0.cast("double"))
        case "min" => min(a0)
        case "max" => max(a0)
        // SPARQL 1.1 leaves GROUP_CONCAT order and SAMPLE choice
        // implementation-defined; sorting / taking the minimum makes both
        // deterministic (and therefore oracle-checkable)
        case "group_concat" =>
          val sep = args.lift(1).collect { case Expr.Lit(s2) => s2.toString }.getOrElse(" ")
          array_join(sort_array(collect_list(a0.cast("string"))), sep)
        case "sample" => min(a0)
      }
    case other => expr(other)
  }

  private def litString(e: Expr.E): String = e match {
    case Expr.Lit(s) => s.toString
    case other => throw new IllegalArgumentException(s"expected literal, got $other")
  }
}

object SparqlFrontend {
  def parse(q: String): SparqlAst.Query = {
    val p = new SparqlParser(SparqlLexer.lex(q))
    val query = p.parseQuery()
    p.ensureEof()
    query
  }

  def run(graph: TripleGraph, query: String): DataFrame =
    new SparqlCompiler(graph).compile(parse(query))

  /** Dataset-aware entry point: `graph` is the default graph, `quads` holds
    * the named graphs addressed by GRAPH patterns (reference processor
    * threads the store's named graphs the same way).
    */
  def run(graph: TripleGraph, query: String, quads: graft.graph.QuadStore): DataFrame =
    new SparqlCompiler(graph, Some(quads)).compile(parse(query))
}
