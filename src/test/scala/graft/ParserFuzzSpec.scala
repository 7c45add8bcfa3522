package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.frontends.cypher.{Ast, CypherFrontend}
import graft.frontends.gql.{GqlCreateGraph, GqlCreateType, GqlCreateVectorIndex,
  GqlFrontend, GqlMutation, GqlPropertyDef}
import graft.graph.{Both, Direction, In, Out}
import graft.ir.Expr

/** Seeded AST → pretty-print → parse → compare round-trip fuzz for the two
  * largest hand-rolled front-ends (the reference carries dedicated parser
  * suites, grafeo-adapters/tests/sparql_parser_tests.rs). The printer emits
  * MINIMAL parentheses from a precedence table mirroring the parser's
  * recursive-descent tiers, so every case exercises precedence,
  * associativity and the lexer (string escapes, numbers, keyword routing) —
  * a mismatch means the printer's table and the parser disagree, i.e. a
  * parser bug or a changed grammar. Seed pinned: failures reproduce.
  */
class ParserFuzzSpec extends AnyFunSuite {

  // ---- printer: minimal-paren expression rendering ----

  private val cmpOps =
    Set("=", "<>", "<", "<=", ">", ">=", "=~", "in", "startswith", "endswith", "contains")

  private def prec(e: Expr.E): Int = e match {
    case Expr.Bin("or", _, _)                  => 1
    case Expr.Bin("xor", _, _)                 => 2
    case Expr.Bin("and", _, _)                 => 3
    case Expr.Not(_)                           => 4
    case Expr.Bin(op, _, _) if cmpOps(op)      => 5
    case Expr.IsNull(_, _)                     => 5
    case Expr.Bin("+" | "-", _, _)             => 6
    case Expr.Bin("*" | "/" | "%" | "^", _, _) => 7
    case Expr.Neg(_)                           => 8
    case Expr.Idx(_, _) | Expr.Slice(_, _, _)  => 9
    case _                                     => 10
  }

  private def opText(op: String): String = op match {
    case "and" => "AND"
    case "or" => "OR"
    case "xor" => "XOR"
    case "in" => "IN"
    case "startswith" => "STARTS WITH"
    case "endswith" => "ENDS WITH"
    case "contains" => "CONTAINS"
    case other => other
  }

  private def esc(s: String): String =
    s.flatMap { case '\\' => "\\\\"; case '\'' => "\\'"; case c => c.toString }

  /** Render `e`; parenthesize when its precedence is below `min`. */
  private def p(e: Expr.E, min: Int): String = {
    val s = render(e)
    if (prec(e) < min) s"($s)" else s
  }

  private def render(e: Expr.E): String = e match {
    case Expr.Lit(null)       => "NULL"
    case Expr.Lit(true)       => "TRUE"
    case Expr.Lit(false)      => "FALSE"
    case Expr.Lit(l: Long)    => l.toString
    case Expr.Lit(d: Double)  => d.toString // generator picks exact decimals
    case Expr.Lit(s: String)  => s"'${esc(s)}'"
    case Expr.Lit(other)      => fail(s"unprintable literal $other")
    case Expr.Var(n)          => n
    case Expr.Prop(v, k)      => s"$v.$k"
    case Expr.Param(n)        => s"$$$n"
    case Expr.Not(x)          => s"NOT ${p(x, 4)}"
    case Expr.Neg(x)          => s"-${p(x, 8)}"
    case Expr.IsNull(x, neg)  => s"${p(x, 5)} IS ${if (neg) "NOT " else ""}NULL"
    case b @ Expr.Bin(op, l, r) =>
      val mp = prec(b)
      // every binary tier is left-associative; the right operand is parsed
      // one tier up, so same-precedence right children need parens
      s"${p(l, mp)} ${opText(op)} ${p(r, mp + 1)}"
    case Expr.ListLit(items)  => items.map(render).mkString("[", ", ", "]")
    case Expr.MapLit(items)   =>
      items.map { case (k, v) => s"$k: ${render(v)}" }.mkString("{", ", ", "}")
    case Expr.Idx(l, i)       => s"${p(l, 9)}[${render(i)}]"
    case Expr.Slice(l, f, t)  =>
      s"${p(l, 9)}[${f.map(render).getOrElse("")}..${t.map(render).getOrElse("")}]"
    case Expr.Func(name, Seq(Expr.Lit("*")), _) => s"$name(*)"
    case Expr.Func(name, args, distinct) =>
      s"$name(${if (distinct) "DISTINCT " else ""}${args.map(render).mkString(", ")})"
    case Expr.CaseW(branches, orElse) =>
      "CASE " + branches.map { case (c, v) =>
        s"WHEN ${render(c)} THEN ${render(v)}"
      }.mkString(" ") + orElse.map(o => s" ELSE ${render(o)}").getOrElse("") + " END"
    case Expr.ListComp(v, list, where, map) =>
      s"[$v IN ${p(list, 6)}" + where.map(w => s" WHERE ${render(w)}").getOrElse("") +
        map.map(m => s" | ${render(m)}").getOrElse("") + "]"
    case Expr.Quant(kind, v, list, pred) =>
      s"$kind($v IN ${p(list, 6)} WHERE ${render(pred)})"
    case Expr.Reduce(acc, init, v, list, step) =>
      s"reduce($acc = ${p(init, 6)}, $v IN ${p(list, 6)} | ${render(step)})"
    case other => fail(s"unprintable expression $other")
  }

  // ---- printer: clauses ----

  private def renderNode(n: Ast.NodePat): String = {
    val labels = (n.label.toSeq ++ n.extraLabels).map(l => s":$l").mkString
    val props =
      if (n.props.isEmpty) ""
      else n.props.map { case (k, v) => s"$k: ${render(v)}" }
        .mkString(" {", ", ", "}")
    s"(${n.v.getOrElse("")}$labels$props)"
  }

  private def renderRel(r: Ast.RelPat): String = {
    val range = r.range.map {
      case (1, -1)            => "*"
      case (lo, hi) if lo == hi => s"*$lo"
      case (lo, -1)           => s"*$lo.."
      case (lo, hi)           => s"*$lo..$hi"
    }.getOrElse("")
    val inner = s"${r.v.getOrElse("")}${r.relTypes.map(t => s":$t").mkString("", "|", "")}$range"
    val body = if (inner.isEmpty) "" else s"[$inner]"
    r.dir match {
      case Out  => s"-$body->"
      case In   => s"<-$body-"
      case Both => s"-$body-"
    }
  }

  private def renderPath(pp: Ast.PathPat): String = {
    val chain = renderNode(pp.head) +
      pp.tail.map { case (r, n) => renderRel(r) + renderNode(n) }.mkString
    pp.shortest match {
      case Some(pv) =>
        val fn = if (pp.shortestAll) "allShortestPaths" else "shortestPath"
        pv.map(v => s"$v = ").getOrElse("") + s"$fn($chain)"
      case None => pp.pathVar.map(v => s"$v = ").getOrElse("") + chain
    }
  }

  private def renderClause(c: Ast.Clause): String = c match {
    case Ast.MatchClause(paths, where, optional) =>
      (if (optional) "OPTIONAL MATCH " else "MATCH ") +
        paths.map(renderPath).mkString(", ") +
        where.map(w => s" WHERE ${render(w)}").getOrElse("")
    case Ast.UnwindClause(list, as) => s"UNWIND ${render(list)} AS $as"
    case Ast.CreateClause(path)     => s"CREATE ${renderPath(path)}"
    case Ast.SetClause(items) => "SET " + items.map {
      case Ast.SetProp(Expr.Prop(v, k), value) => s"$v.$k = ${render(value)}"
      case Ast.SetAllProps(v, m, merge) =>
        s"$v ${if (merge) "+=" else "="} ${render(m)}"
      case Ast.SetLabel(v, labels) => s"$v${labels.map(l => s":$l").mkString}"
    }.mkString(", ")
    case Ast.DeleteClause(vars, detach) =>
      (if (detach) "DETACH DELETE " else "DELETE ") + vars.mkString(", ")
    case Ast.MergeClause(node, onCreate, onMatch) =>
      s"MERGE ${renderNode(node)}" +
        (if (onCreate.nonEmpty) " ON CREATE SET " + onCreate.map {
          case (Expr.Prop(v, k), value) => s"$v.$k = ${render(value)}"
        }.mkString(", ") else "") +
        (if (onMatch.nonEmpty) " ON MATCH SET " + onMatch.map {
          case (Expr.Prop(v, k), value) => s"$v.$k = ${render(value)}"
        }.mkString(", ") else "")
    case Ast.RemoveClause(v, label)    => s"REMOVE $v:$label"
    case Ast.RemovePropClause(v, prop) => s"REMOVE $v.$prop"
    case Ast.WithRet(items, distinct, where, orderBy, skip, limit, isReturn) =>
      (if (isReturn) "RETURN " else "WITH ") +
        (if (distinct) "DISTINCT " else "") +
        items.map {
          case (Expr.Var("*"), None) => "*"
          case (e, alias)            => render(e) + alias.map(a => s" AS $a").getOrElse("")
        }.mkString(", ") +
        where.map(w => s" WHERE ${render(w)}").getOrElse("") +
        (if (orderBy.nonEmpty) " ORDER BY " + orderBy.map { case (e, asc) =>
          render(e) + (if (asc) "" else " DESC")
        }.mkString(", ") else "") +
        skip.map(n => s" SKIP $n").getOrElse("") +
        limit.map(n => s" LIMIT $n").getOrElse("")
  }

  private def renderQuery(q: Ast.Query): String =
    q.clauses.map(renderClause).mkString(" ")

  // ---- generators ----

  private val rnd = new Random(0x6A5F7)

  private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
  private def ident(): String = {
    val s = ("" + ('a' + rnd.nextInt(26)).toChar) +
      (if (rnd.nextBoolean()) rnd.nextInt(10).toString else "")
    // never a keyword, never the function names the parser special-cases
    if (Set("as", "by", "is", "in", "on", "or").contains(s)) ident() else s
  }
  private val funcNames =
    Seq("coalesce", "abs", "size", "trim", "toUpper", "toLower", "round")
  private val strPool =
    Seq("x", "it's", "a\\b", "hello world", "", "100%", "quote\"d")
  private val doublePool = Seq(0.5, 1.25, 3.75, 10.125)

  private def litE(): Expr.E = rnd.nextInt(6) match {
    case 0 => Expr.Lit(rnd.nextInt(1000).toLong)
    case 1 => Expr.Lit(pick(doublePool))
    case 2 => Expr.Lit(pick(strPool))
    case 3 => Expr.Lit(rnd.nextBoolean())
    case 4 => Expr.Lit(null)
    case _ => Expr.Lit(rnd.nextInt(100).toLong)
  }

  private def atomE(): Expr.E = rnd.nextInt(8) match {
    case 0 | 1  => litE()
    case 2 | 3  => Expr.Var(ident())
    case 4      => Expr.Prop(ident(), ident())
    case 5      => Expr.Param(ident())
    case 6      => Expr.MapLit(Seq(ident() -> litE()))
    case _      => Expr.ListLit(Seq.fill(rnd.nextInt(3))(litE()))
  }

  /** `noIn`: [x IN list] as a whole-list first element re-parses as a list
    * comprehension (openCypher shares this ambiguity), so IN is excluded
    * where the generated expression could land in that position.
    */
  private def genE(depth: Int, noIn: Boolean = false): Expr.E =
    if (depth <= 0) atomE()
    else rnd.nextInt(14) match {
      case 0 | 1 =>
        Expr.Bin(pick(Seq("and", "or", "xor")), genE(depth - 1, noIn), genE(depth - 1, noIn))
      case 2 | 3 =>
        val ops = Seq("=", "<>", "<", "<=", ">", ">=", "=~",
          "startswith", "endswith", "contains") ++ (if (noIn) Nil else Seq("in"))
        Expr.Bin(pick(ops), genE(depth - 1, noIn), genE(depth - 1, noIn))
      case 4 | 5 =>
        Expr.Bin(pick(Seq("+", "-", "*", "/", "%", "^")),
          genE(depth - 1, noIn), genE(depth - 1, noIn))
      case 6  => Expr.Not(genE(depth - 1, noIn))
      case 7  => Expr.Neg(genE(depth - 1, noIn))
      case 8  => Expr.IsNull(genE(depth - 1, noIn), rnd.nextBoolean())
      case 9  => Expr.Func(pick(funcNames),
        Seq.fill(1 + rnd.nextInt(2))(genE(depth - 1, noIn)), distinct = false)
      case 10 => Expr.CaseW(
        Seq.fill(1 + rnd.nextInt(2))((genE(depth - 1, noIn), genE(depth - 1, noIn))),
        if (rnd.nextBoolean()) Some(genE(depth - 1, noIn)) else None)
      case 11 =>
        if (rnd.nextBoolean()) Expr.Idx(genE(depth - 1, noIn), genE(depth - 1, noIn))
        else Expr.Slice(genE(depth - 1, noIn),
          if (rnd.nextBoolean()) Some(genE(depth - 1, noIn)) else None,
          if (rnd.nextBoolean()) Some(genE(depth - 1, noIn)) else None)
      case 12 =>
        val v = ident()
        rnd.nextInt(3) match {
          case 0 => Expr.ListComp(v, genE(depth - 1, noIn = true),
            if (rnd.nextBoolean()) Some(genE(depth - 1, noIn)) else None,
            if (rnd.nextBoolean()) Some(genE(depth - 1, noIn)) else None)
          case 1 => Expr.Quant(pick(Seq("all", "any", "none", "single")),
            v, atomE(), genE(depth - 1, noIn))
          case _ => Expr.Reduce(ident(), atomE(), v, atomE(), genE(depth - 1, noIn))
        }
      case _ => Expr.ListLit(Seq.fill(rnd.nextInt(3))(genE(depth - 1, noIn = true)))
    }

  // labels / property keys may be RAW KEYWORDS (the parser accepts Kw.raw
  // in those positions) - exercise that routing too
  private def labelName(): String =
    if (rnd.nextInt(5) == 0) pick(Seq("Match", "Create", "Order", "Limit"))
    else ident().capitalize
  private def genNode(): Ast.NodePat = {
    val labels = Seq.fill(rnd.nextInt(3))(labelName())
    Ast.NodePat(
      if (rnd.nextInt(4) > 0) Some(ident()) else None,
      labels.headOption,
      Seq.fill(rnd.nextInt(3))((
        if (rnd.nextInt(6) == 0) pick(Seq("order", "skip", "end")) else ident(),
        pick(Seq(litE(), Expr.Param(ident()))))),
      labels.drop(1))
  }

  private def genRel(): Ast.RelPat = {
    val range = rnd.nextInt(5) match {
      case 0 => Some((1, -1))
      case 1 => val n = 1 + rnd.nextInt(4); Some((n, n))
      case 2 => Some((1 + rnd.nextInt(3), -1))
      case 3 => val lo = rnd.nextInt(3); Some((lo, lo + 1 + rnd.nextInt(3)))
      case _ => None
    }
    Ast.RelPat(
      if (rnd.nextBoolean()) Some(ident()) else None,
      Seq.fill(rnd.nextInt(3))(ident().toUpperCase),
      pick(Seq(In, Out, Both)),
      range)
  }

  private def genPath(): Ast.PathPat = rnd.nextInt(8) match {
    case 0 => // shortest-path form (tail required)
      Ast.PathPat(genNode(), Seq((genRel(), genNode())),
        shortest = Some(if (rnd.nextBoolean()) Some(ident()) else None),
        pathVar = None, shortestAll = rnd.nextBoolean())
    case 1 => // plain path-variable binding
      Ast.PathPat(genNode(), Seq.fill(1 + rnd.nextInt(2))((genRel(), genNode())),
        pathVar = Some(ident()))
    case _ =>
      Ast.PathPat(genNode(), Seq.fill(rnd.nextInt(3))((genRel(), genNode())))
  }

  private def genWithRet(isReturn: Boolean): Ast.WithRet = {
    val items =
      if (isReturn && rnd.nextInt(8) == 0) Seq((Expr.Var("*"): Expr.E, None))
      else Seq.fill(1 + rnd.nextInt(3))(
        (genE(2), if (rnd.nextBoolean()) Some(ident()) else None))
    Ast.WithRet(items,
      distinct = rnd.nextInt(4) == 0,
      where = if (rnd.nextInt(3) == 0) Some(genE(2)) else None,
      orderBy = Seq.fill(rnd.nextInt(3))((genE(1), rnd.nextBoolean())),
      skip = if (rnd.nextInt(4) == 0) Some(rnd.nextInt(100).toLong) else None,
      limit = if (rnd.nextInt(3) == 0) Some(1 + rnd.nextInt(100).toLong) else None,
      isReturn = isReturn)
  }

  private def genSetItems(n: Int): Seq[Ast.SetItem] = Seq.fill(n)(rnd.nextInt(4) match {
    case 0 => Ast.SetLabel(ident(), Seq.fill(1 + rnd.nextInt(2))(ident().capitalize))
    case 1 => Ast.SetAllProps(ident(), Expr.MapLit(Seq(ident() -> litE())),
      merge = rnd.nextBoolean())
    case _ => Ast.SetProp(Expr.Prop(ident(), ident()), genE(1))
  })

  private def genQuery(): Ast.Query = {
    val cs = Seq.newBuilder[Ast.Clause]
    cs += Ast.MatchClause(Seq.fill(1 + rnd.nextInt(2))(genPath()),
      if (rnd.nextInt(3) == 0) Some(genE(2)) else None)
    if (rnd.nextInt(3) == 0)
      cs += Ast.MatchClause(Seq(genPath()), None, optional = true)
    if (rnd.nextInt(4) == 0) cs += Ast.UnwindClause(genE(1), ident())
    if (rnd.nextInt(3) == 0) cs += genWithRet(isReturn = false)
    rnd.nextInt(4) match {
      case 0 => // mutation tail
        rnd.nextInt(5) match {
          case 0 => cs += Ast.CreateClause(genPath())
          case 1 => cs += Ast.SetClause(genSetItems(1 + rnd.nextInt(2)))
          case 2 => cs += Ast.DeleteClause(Seq.fill(1 + rnd.nextInt(2))(ident()),
            detach = rnd.nextBoolean())
          case 3 => cs += (if (rnd.nextBoolean())
            Ast.RemoveClause(ident(), ident().capitalize)
          else Ast.RemovePropClause(ident(), ident()))
          case _ => cs += Ast.MergeClause(genNode(),
            onCreate = Seq.fill(rnd.nextInt(2))((Expr.Prop(ident(), ident()), litE())),
            onMatch = Seq.fill(rnd.nextInt(2))((Expr.Prop(ident(), ident()), litE())))
        }
      case _ => cs += genWithRet(isReturn = true)
    }
    Ast.Query(cs.result())
  }

  private def roundTrip(q: Ast.Query): Unit = {
    val text = renderQuery(q)
    val parsed =
      try CypherFrontend.parse(text)
      catch {
        case e: Throwable =>
          fail(s"parse failed for generated query\n  text: $text\n  ast:  $q\n  err:  ${e.getMessage}")
      }
    assert(parsed == q, s"\n  text:   $text\n  wanted: $q\n  got:    $parsed")
  }

  // ---- the fuzz passes (seed pinned above — failures reproduce) ----

  test("cypher: 300 expression round-trips (minimal parens)") {
    for (_ <- 1 to 300) {
      val e = genE(if (rnd.nextBoolean()) 3 else 4)
      roundTrip(Ast.Query(Seq(Ast.WithRet(Seq((e, Some("r"))),
        distinct = false, None, Nil, None, None, isReturn = true))))
    }
  }

  test("cypher: 250 full-query round-trips") {
    for (_ <- 1 to 250) roundTrip(genQuery())
  }

  test("cypher: 60 UNION statement round-trips") {
    for (_ <- 1 to 60) {
      def readQuery(): Ast.Query = {
        // UNION branches must end in RETURN
        val q = genQuery()
        if (q.clauses.last.isInstanceOf[Ast.WithRet] &&
          q.clauses.last.asInstanceOf[Ast.WithRet].isReturn) q
        else Ast.Query(q.clauses :+ genWithRet(isReturn = true))
      }
      val all = rnd.nextBoolean()
      val parts = Seq.fill(2 + rnd.nextInt(2))(readQuery())
      val text = parts.map(renderQuery)
        .mkString(if (all) " UNION ALL " else " UNION ")
      val expected = parts.zipWithIndex.map { case (q, i) => (q, i > 0 && all) }
      val parsed =
        try CypherFrontend.parseAll(text)
        catch {
          case e: Throwable => fail(s"parse failed\n  text: $text\n  err: ${e.getMessage}")
        }
      assert(parsed == expected, s"\n  text: $text")
    }
  }

  test("gremlin: 150 step-list round-trips") {
    import graft.frontends.gremlin.GremlinFrontend
    import GremlinFrontend.St
    // the Pred constructor is package-private; round-trip the parse-only
    // surface: step names, string/long/double/bool args, and P./TextP.
    // predicate calls (printed in both prefixed and bare spellings)
    def renderArg(a: Any): String = a match {
      case s: String  => s"'${s.flatMap { case '\'' => "\\'"; case '\\' => "\\\\"; case c => c.toString }}'"
      case l: Long    => l.toString
      case d: Double  => d.toString
      case b: Boolean => b.toString
      case other      => fail(s"unprintable gremlin arg $other")
    }
    def genArg(): Any = rnd.nextInt(5) match {
      case 0 => ident()
      case 1 => rnd.nextInt(2000).toLong - 1000L
      case 2 => pick(doublePool)
      case 3 => pick(strPool) // incl. quotes/backslashes - escape handling
      case _ => rnd.nextBoolean()
    }
    val stepNames = Seq("V", "hasLabel", "has", "out", "in", "both", "values",
      "dedup", "limit", "order", "count", "as", "select", "where", "by")
    for (_ <- 1 to 150) {
      val steps = St("V", Seq.empty) +: Seq.fill(1 + rnd.nextInt(5))(
        St(pick(stepNames.tail), Seq.fill(rnd.nextInt(3))(genArg())))
      val text = "g." + steps.map { s =>
        s"${s.name}(${s.args.map(renderArg).mkString(", ")})"
      }.mkString(".")
      val parsed =
        try GremlinFrontend.parseSteps(text)
        catch {
          case e: Throwable =>
            fail(s"parse failed\n  text: $text\n  err: ${e.getMessage}")
        }
      assert(parsed == steps, s"\n  text:   $text\n  wanted: $steps\n  got:    $parsed")
    }
  }

  test("gql: 100 DDL statement round-trips") {
    val types = Seq("STRING", "INT", "FLOAT", "BOOL")
    for (_ <- 1 to 100) {
      rnd.nextInt(3) match {
        case 0 =>
          val kind = pick(Seq("NODE", "EDGE"))
          val props = Seq.fill(1 + rnd.nextInt(3)) {
            GqlPropertyDef(ident(), pick(types),
              nullable = rnd.nextBoolean(), unique = rnd.nextInt(3) == 0)
          }
          val name = ident().capitalize
          val body = props.map { d =>
            s"${d.name} ${d.dataType}" +
              (if (!d.nullable) " NOT NULL" else "") +
              (if (d.unique) " UNIQUE" else "")
          }.mkString(", ")
          val text = s"CREATE $kind TYPE $name ($body)"
          assert(GqlFrontend.parseStatement(text) ==
            GqlCreateType(kind.toLowerCase, name, props), s"\n  text: $text")
        case 1 =>
          val method = pick(Seq("lsh", "ivf", "hnsw"))
          val opts = Seq.fill(rnd.nextInt(3))(
            pick(Seq("bits", "cells", "m", "efc")) -> (1 + rnd.nextInt(64)))
            .distinctBy(_._1)
          val metric = if (method == "hnsw" && rnd.nextBoolean()) Some("cosine") else None
          val (name, label, prop) = (ident(), ident().capitalize, ident())
          val optText =
            (opts.map { case (k, v) => s"$k $v" } ++ metric.map(m => s"metric $m"))
              .mkString(", ")
          val text = s"CREATE VECTOR INDEX $name ON $label($prop) USING ${method.toUpperCase}" +
            (if (optText.nonEmpty) s" OPTIONS($optText)" else "")
          assert(GqlFrontend.parseStatement(text) ==
            GqlCreateVectorIndex(name, label, prop, method, opts.toMap, metric),
            s"\n  text: $text")
        case _ =>
          val (g, like) = (ident(), if (rnd.nextBoolean()) Some(ident()) else None)
          val text = s"CREATE GRAPH $g" + like.map(l => s" LIKE $l").getOrElse("")
          assert(GqlFrontend.parseStatement(text) == GqlCreateGraph(g, like),
            s"\n  text: $text")
      }
    }
  }

  test("sparql: 250 property-path round-trips (precedence | < / < ^ < postfix)") {
    import graft.frontends.sparql.{SparqlAst, SparqlFrontend}
    import SparqlAst._
    // minimal-paren printer mirroring parsePathAlt/Seq/Unary:
    // alt(1) < seq(2) < inverse(3) < postfix(4) < primary(5).
    // ^ applies to a POSTFIXED primary (SPARQL PathEltOrInverse), so
    // PInv(PClosure(p)) prints ^p* bare while PClosure(PInv(p)) needs (^p)*.
    def pprec(e: PathE): Int = e match {
      case _: PAlt              => 1
      case _: PSeq              => 2
      case _: PInv              => 3
      case _: PClosure | _: POpt => 4
      case _                    => 5
    }
    def pr(e: PathE, min: Int): String = {
      val s = prender(e)
      if (pprec(e) < min) s"($s)" else s
    }
    def prender(e: PathE): String = e match {
      case PLink(w)            => w
      case PAlt(l, r)          => s"${pr(l, 1)}|${pr(r, 2)}"
      case PSeq(l, r)          => s"${pr(l, 2)}/${pr(r, 3)}"
      case PInv(x)             => s"^${pr(x, 4)}"
      case PClosure(x, true)   => s"${pr(x, 4)}*"
      case PClosure(x, false)  => s"${pr(x, 4)}+"
      case POpt(x)             => s"${pr(x, 4)}?"
      case PNeg(fwd, inv) =>
        val members = fwd.map(identity) ++ inv.map("^" + _)
        if (members.size == 1) s"!${members.head}"
        else s"!(${members.mkString("|")})"
    }
    val preds = Seq("knows", "inNation", "segment", "child", "rdf:type")
    def genPath(depth: Int): PathE =
      if (depth <= 0) PLink(pick(preds))
      else rnd.nextInt(8) match {
        case 0 | 1 => PAlt(genPath(depth - 1), genPath(depth - 1))
        case 2 | 3 => PSeq(genPath(depth - 1), genPath(depth - 1))
        case 4     => PInv(genPath(depth - 1))
        case 5     => PClosure(genPath(depth - 1), rnd.nextBoolean())
        case 6     => POpt(genPath(depth - 1))
        case _ =>
          val fwd = Seq.fill(rnd.nextInt(3))(pick(preds)).distinct
          val inv = Seq.fill(rnd.nextInt(2))(pick(preds)).distinct
          if (fwd.isEmpty && inv.isEmpty) PNeg(Seq(pick(preds)), Nil)
          else PNeg(fwd, inv)
      }
    var tried = 0
    while (tried < 250) {
      val path = genPath(3)
      // a bare link parses as a plain BGP triple, not a PathP — skip those
      if (!path.isInstanceOf[PLink]) {
        tried += 1
        val text = s"SELECT * WHERE { ?s ${prender(path)} ?o }"
        val q =
          try SparqlFrontend.parse(text)
          catch {
            case e: Throwable =>
              fail(s"parse failed\n  text: $text\n  ast: $path\n  err: ${e.getMessage}")
          }
        q.where match {
          case PathP(graft.graph.V("s"), got, graft.graph.V("o")) =>
            assert(got == path, s"\n  text:   $text\n  wanted: $path\n  got:    $got")
          case other => fail(s"expected PathP for: $text, got $other")
        }
      }
    }
  }

  test("sparql: 250 FILTER expression round-trips") {
    import graft.frontends.sparql.{SparqlAst, SparqlFrontend}
    // SPARQL's tiers differ from Cypher's: || < && < ! < cmp < add < mul,
    // the comparison tier is NON-CHAINING (a = b = c is a parse error, so a
    // cmp child of cmp parenthesizes on BOTH sides), and mul's right
    // operand is a bare atom. Negative numeric literals lex as one token
    // only when '-' directly precedes a digit — the printer's spaced
    // operators keep `a - 5` and `a + -5` distinct.
    val sCmp = Set("=", "<>", "<", "<=", ">", ">=")
    def sprec(e: Expr.E): Int = e match {
      case Expr.Bin("or", _, _)          => 1
      case Expr.Bin("and", _, _)         => 2
      case Expr.Not(_)                   => 3
      case Expr.Bin(op, _, _) if sCmp(op) => 4
      case Expr.Bin("+" | "-", _, _)     => 5
      case Expr.Bin("*" | "/", _, _)     => 6
      case _                             => 7
    }
    def sp(e: Expr.E, min: Int): String = {
      val s = srender(e)
      if (sprec(e) < min) s"($s)" else s
    }
    def srender(e: Expr.E): String = e match {
      case Expr.Lit(true)      => "TRUE"
      case Expr.Lit(false)     => "FALSE"
      case Expr.Lit(l: Long)   => l.toString
      case Expr.Lit(d: Double) => d.toString
      case Expr.Lit(s: String) => s"'${esc(s)}'"
      case Expr.Var(n)         => s"?$n"
      case Expr.Not(x)         => s"!${sp(x, 3)}"
      case Expr.Bin("or", l, r)  => s"${sp(l, 1)} || ${sp(r, 2)}"
      case Expr.Bin("and", l, r) => s"${sp(l, 2)} && ${sp(r, 3)}"
      case Expr.Bin(op, l, r) if sCmp(op) =>
        val opTxt = if (op == "<>") "!=" else op
        s"${sp(l, 5)} $opTxt ${sp(r, 5)}"
      case Expr.Bin(op @ ("+" | "-"), l, r) => s"${sp(l, 5)} $op ${sp(r, 6)}"
      case Expr.Bin(op @ ("*" | "/"), l, r) => s"${sp(l, 6)} $op ${sp(r, 7)}"
      case Expr.Func(name, args, false) =>
        s"$name(${args.map(srender).mkString(", ")})"
      case other => fail(s"unprintable sparql expression $other")
    }
    def sAtom(): Expr.E = rnd.nextInt(6) match {
      case 0 => Expr.Var(ident())
      case 1 => Expr.Lit(rnd.nextInt(2000).toLong - 1000L) // incl. negatives
      case 2 => Expr.Lit(pick(doublePool))
      case 3 => Expr.Lit(pick(strPool))
      case 4 => Expr.Lit(rnd.nextBoolean())
      case _ => Expr.Var(ident())
    }
    def sGen(depth: Int): Expr.E =
      if (depth <= 0) sAtom()
      else rnd.nextInt(10) match {
        case 0 | 1 => Expr.Bin(pick(Seq("or", "and")), sGen(depth - 1), sGen(depth - 1))
        case 2 | 3 => Expr.Bin(pick(sCmp.toSeq), sGen(depth - 1), sGen(depth - 1))
        case 4 | 5 => Expr.Bin(pick(Seq("+", "-", "*", "/")), sGen(depth - 1), sGen(depth - 1))
        case 6     => Expr.Not(sGen(depth - 1))
        case 7     => Expr.Func(pick(Seq("strlen", "lcase", "ucase", "str")),
          Seq(sGen(depth - 1)), distinct = false)
        case _     => sAtom()
      }
    for (_ <- 1 to 250) {
      val e = sGen(3)
      val text = s"SELECT * WHERE { ?s knows ?o FILTER(${srender(e)}) }"
      val q =
        try SparqlFrontend.parse(text)
        catch {
          case ex: Throwable =>
            fail(s"parse failed\n  text: $text\n  ast: $e\n  err: ${ex.getMessage}")
        }
      q.where match {
        case SparqlAst.FilterP(_, got) =>
          assert(got == e, s"\n  text:   $text\n  wanted: $e\n  got:    $got")
        case other => fail(s"expected FilterP for: $text, got $other")
      }
    }
  }

  test("graphql: 150 document round-trips (nested selections, args, mutations)") {
    import graft.frontends.graphql.GraphQLFrontend
    import GraphQLFrontend.Field
    // printer: spec-escape strings (the parser decodes standard escapes, so
    // the printer must emit them — raw control characters are not legal in
    // a GraphQL StringValue)
    def renderStr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    } + "\""
    def renderVal(v: Any): String = v match {
      case s: String  => renderStr(s)
      case l: Long    => l.toString
      case d: Double  => d.toString
      case b: Boolean => b.toString
      case null       => "null"
      case other      => fail(s"unprintable graphql value $other")
    }
    // enum-style bare idents must dodge the parser's keyword values
    def enumIdent(): String = {
      val w = ident(); if (Set("true", "false", "null")(w)) "EnumV" else w
    }
    val gqlStrPool = strPool ++ Seq("tab\there", "line\nbreak", "cr\rend")
    def genVal(): Any = rnd.nextInt(6) match {
      case 0 => pick(gqlStrPool)
      case 1 => rnd.nextInt(2000).toLong - 1000L
      case 2 => pick(doublePool)
      case 3 => rnd.nextBoolean()
      case 4 => null
      case _ => enumIdent()
    }
    def genField(depth: Int): Field = {
      val nSel =
        if (depth >= 3) 0
        else if (depth == 0) 1 + rnd.nextInt(3)
        else rnd.nextInt(3)
      Field(ident().capitalize,
        Seq.fill(rnd.nextInt(3))((ident(), genVal())),
        Seq.fill(nSel)(genField(depth + 1)))
    }
    // enum values parse back as plain strings — normalize the expectation
    def norm(f: Field): Field = f.copy(
      args = f.args.map { case (k, v) => (k, v) },
      selections = f.selections.map(norm))
    def render(f: Field, sb: StringBuilder): Unit = {
      sb.append(f.name)
      if (f.args.nonEmpty) {
        sb.append('(')
        sb.append(f.args.map { case (k, v) => s"$k: ${renderVal(v)}" }
          .mkString(if (rnd.nextBoolean()) ", " else " "))
        sb.append(')')
      }
      if (f.selections.nonEmpty) {
        sb.append(" { ")
        f.selections.foreach { s => render(s, sb); sb.append(' ') }
        sb.append("} ")
      }
    }
    for (k <- 1 to 150) {
      val root = genField(0)
      val sb = new StringBuilder
      val mutation = k % 3 == 0
      if (mutation) sb.append(if (k % 6 == 0) "mutation {" else "mutation{")
      else sb.append("{ ")
      render(root, sb)
      sb.append('}')
      val text = sb.toString
      val (isMut, parsed) =
        try GraphQLFrontend.parseDocument(text)
        catch {
          case e: Throwable =>
            fail(s"parse failed\n  text: $text\n  err: ${e.getMessage}")
        }
      assert(isMut == mutation, s"\n  text: $text")
      assert(parsed == norm(root), s"\n  text:   $text\n  wanted: $root\n  got:    $parsed")
    }
  }

  test("gql: 60 INSERT mutation round-trips") {
    for (_ <- 1 to 60) {
      // INSERT takes comma-separated node patterns → one CreateClause each
      val paths = Seq.fill(1 + rnd.nextInt(3))(
        Ast.PathPat(genNode(), Nil))
      val text = "INSERT " + paths.map(renderPath).mkString(", ")
      GqlFrontend.parseStatement(text) match {
        case GqlMutation(q) =>
          assert(q == Ast.Query(paths.map(Ast.CreateClause)), s"\n  text: $text")
        case other => fail(s"expected GqlMutation for: $text, got $other")
      }
    }
  }
}
