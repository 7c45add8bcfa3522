package graft.frontends.gremlin

import graft.graph.{Both, In, Out}
import graft.ir.{Expr, Op}

/** Gremlin front-end (SURVEY §2.8; reference
  * crates/grafeo-adapters/src/query/gremlin/ast.rs:19-187 +
  * gremlin_translator.rs). A traversal is a fold over steps into the shared
  * IR — each step transforms the current binding (the traverser position is
  * the IR variable `cur`).
  *
  * Supported steps: V, hasLabel, has(k,v|pred), out/in/both(rel), values,
  * id, dedup, limit, skip, range, order().by(k[, decr]), count, sum, mean,
  * min, max, groupCount().by(k), as(name), select(a,b,…).by(prop)…, path(),
  * outE/inE(rel) + inV/outV (edge-position traversal), valueMap(k…).
  * Predicates: eq, neq, gt, gte, lt, lte, within.
  */
object GremlinFrontend {

  final case class St(name: String, args: Seq[Any]) // parsed step
  private final case class Pred(op: String, values: Seq[Any])

  // ---- parser: g.step(args).step(args)… ----
  def parseSteps(q: String): Seq[St] = {
    var i = 0
    val n = q.length
    def ws(): Unit = while (i < n && q(i).isWhitespace) i += 1
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"gremlin parse error at $i: $msg")
    def ident(): String = {
      ws()
      val start = i
      while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
      if (i == start) fail("expected identifier")
      q.substring(start, i)
    }
    def value(): Any = {
      ws()
      if (i >= n) fail("unexpected end of traversal")
      q(i) match {
        case '\'' | '"' =>
          val quote = q(i)
          val sb = new StringBuilder
          i += 1
          while (i < n && q(i) != quote) { sb += q(i); i += 1 }
          if (i >= n) fail("unterminated string")
          i += 1
          sb.toString
        case c if c.isDigit || c == '-' =>
          val start = i
          i += 1
          while (i < n && (q(i).isDigit || q(i) == '.')) i += 1
          val s = q.substring(start, i)
          if (s.contains('.')) s.toDouble else s.toLong
        case c if c.isLetter =>
          val name = ident()
          ws()
          if (i < n && q(i) == '(') {
            i += 1
            val vs = values()
            ws()
            if (i >= n || q(i) != ')') fail("expected )")
            i += 1
            Pred(name, vs)
          } else name match {
            case "true" => true
            case "false" => false
            case other => fail(s"unexpected bare word $other")
          }
        case other => fail(s"unexpected char $other")
      }
    }
    def values(): Seq[Any] = {
      ws()
      if (i >= n) fail("unexpected end of traversal")
      if (q(i) == ')') return Seq.empty
      val out = Seq.newBuilder[Any]
      out += value()
      ws()
      while (i < n && q(i) == ',') { i += 1; out += value(); ws() }
      out.result()
    }
    ws()
    if (ident() != "g") fail("traversal must start with g")
    val steps = Seq.newBuilder[St]
    ws()
    while (i < n && q(i) == '.') {
      i += 1
      val name = ident()
      ws()
      if (i >= n || q(i) != '(') fail(s"step $name needs ()")
      i += 1
      val args = values()
      ws()
      if (i >= n || q(i) != ')') fail("expected )")
      i += 1
      steps += St(name, args)
      ws()
    }
    if (i < n) fail(s"trailing input: ${q.substring(i)}")
    steps.result()
  }

  // ---- translate: fold steps into IR ----
  def translate(q: String): Op.T = {
    val steps = parseSteps(q)
    require(steps.nonEmpty && steps.head.name == "V",
      "traversal must start with g.V()")
    var anon = 0
    def fresh(): String = { anon += 1; s"__g$anon" }
    var cur = fresh()
    var op: Op.T = Op.NodeScan(cur, None)

    var valueCol: Option[String] = None // set once values()/id() projected
    var pendingOrder = false
    var consumedBy = -1 // index of a by() already folded into groupCount()
    val consumedBys = scala.collection.mutable.Set.empty[Int] // by()s folded into select()
    val aliases = scala.collection.mutable.Map.empty[String, String] // as-name -> IR var
    val visited = scala.collection.mutable.ArrayBuffer.empty[String] // traverser path
    var edgeCur: Option[(String, String)] = None // (edge var, pending dst var) after outE/inE

    def predExpr(colE: Expr.E, v: Any): Expr.E = v match {
      case Pred("eq", vs)  => Expr.Bin("=", colE, Expr.Lit(vs.head))
      case Pred("neq", vs) => Expr.Bin("<>", colE, Expr.Lit(vs.head))
      case Pred("gt", vs)  => Expr.Bin(">", colE, Expr.Lit(vs.head))
      case Pred("gte", vs) => Expr.Bin(">=", colE, Expr.Lit(vs.head))
      case Pred("lt", vs)  => Expr.Bin("<", colE, Expr.Lit(vs.head))
      case Pred("lte", vs) => Expr.Bin("<=", colE, Expr.Lit(vs.head))
      case Pred("within", vs) =>
        Expr.Bin("in", colE, Expr.ListLit(vs.map(Expr.Lit)))
      case lit2 => Expr.Bin("=", colE, Expr.Lit(lit2))
    }

    for ((s, idx) <- steps.zipWithIndex) s.name match {
      case "V" =>
        require(idx == 0, "V() only at the start")
        visited += cur
      case "hasLabel" =>
        op = Op.Filter(op, Expr.Bin("in", Expr.Lit(s.args.head),
          Expr.Func("labels", Seq(Expr.Var(cur)))))
      case "has" =>
        val key = s.args.head.asInstanceOf[String]
        op = Op.Filter(op, predExpr(Expr.Prop(cur, key), s.args(1)))
      case "out" | "in" | "both" =>
        val dir = s.name match {
          case "out" => Out
          case "in" => In
          case _ => Both
        }
        val to = fresh()
        op = Op.Expand(op, cur, s.args.headOption.map(_.asInstanceOf[String]),
          to, dir, None)
        cur = to
        visited += to
      case "outE" | "inE" =>
        // traverser moves onto the edge: bind edge var now, node var pending
        val dir = if (s.name == "outE") Out else In
        val to = fresh()
        val ev = fresh()
        op = Op.Expand(op, cur, s.args.headOption.map(_.asInstanceOf[String]),
          to, dir, None, Some(ev))
        edgeCur = Some((ev, to))
      case "inV" | "outV" =>
        val (_, pendingDst) = edgeCur.getOrElse(
          throw new IllegalArgumentException(s"${s.name}() only after outE()/inE()"))
        cur = pendingDst
        visited += cur
        edgeCur = None
      case "values" =>
        val key = s.args.head.asInstanceOf[String]
        val owner = edgeCur.map(_._1).getOrElse(cur) // edge position reads edge props
        op = Op.Project(op, Seq((Expr.Prop(owner, key), key)))
        valueCol = Some(key)
      case "label" =>
        val owner = edgeCur.map(_._1).getOrElse(cur)
        val e: Expr.E =
          if (edgeCur.isDefined) Expr.Func("type", Seq(Expr.Var(owner)))
          else Expr.Func("labels", Seq(Expr.Var(owner)))
        op = Op.Project(op, Seq((e, "label")))
        valueCol = Some("label")
      case "id" =>
        op = Op.Project(op, Seq((Expr.Var(cur), "id")))
        valueCol = Some("id")
      case "dedup" => op = Op.Distinct(op)
      case "limit" => op = Op.Limit(op, s.args.head.asInstanceOf[Long])
      case "skip"  => op = Op.Skip(op, s.args.head.asInstanceOf[Long])
      case "range" =>
        val (lo, hi) = (s.args(0).asInstanceOf[Long], s.args(1).asInstanceOf[Long])
        op = Op.Limit(Op.Skip(op, lo), hi - lo)
      case "as" =>
        aliases(s.args.head.asInstanceOf[String]) = cur
      case "select" =>
        // select('a','b').by('p1').by('p2'): project named traverser
        // positions; each trailing by() supplies the i-th projection key
        val names = s.args.map(_.asInstanceOf[String])
        val bys = Iterator.from(idx + 1)
          .takeWhile(j => steps.lift(j).exists(_.name == "by"))
          .map(j => { consumedBys += j; steps(j).args.head.asInstanceOf[String] })
          .toSeq
        val items = names.zipWithIndex.map { case (nm, i) =>
          val v = aliases.getOrElse(nm,
            throw new IllegalArgumentException(s"select('$nm') has no as('$nm')"))
          val e: Expr.E = bys.lift(i) match {
            case Some(k) => Expr.Prop(v, k)
            case None => Expr.Var(v)
          }
          (e, nm)
        }
        op = Op.Project(op, items)
        valueCol = Some(names.head)
      case "path" =>
        op = Op.Project(op, Seq(
          (Expr.ListLit(visited.toSeq.map(Expr.Var(_))), "path")))
        valueCol = Some("path")
      case "order" => pendingOrder = true
      case "by" if idx == consumedBy || consumedBys.contains(idx) => () // folded into groupCount()/select()
      case "by" =>
        require(pendingOrder, "by() only after order()")
        val key = s.args.headOption.map(_.asInstanceOf[String])
        val asc = !s.args.lastOption.contains("decr")
        val sortE: Expr.E = key match {
          case Some(k) if valueCol.isDefined => Expr.Var(k)  // post-projection
          case Some(k) => Expr.Prop(cur, k)
          case None => valueCol.map(Expr.Var(_): Expr.E).getOrElse(Expr.Var(cur))
        }
        op = Op.Sort(op, Seq((sortE, asc)))
        pendingOrder = false
      case "count" =>
        op = Op.Aggregate(op, Seq.empty,
          Seq((Expr.Func("count", Seq(Expr.Lit("*"))), "count")))
      case "sum" | "mean" | "min" | "max" =>
        val fn = if (s.name == "mean") "avg" else s.name
        val target: Expr.E = s.args.headOption match {
          case Some(k: String) => Expr.Prop(cur, k)
          case _ => Expr.Var(valueCol.getOrElse(
            throw new IllegalArgumentException(s"${s.name}() needs values() first or a key")))
        }
        op = Op.Aggregate(op, Seq.empty, Seq((Expr.Func(fn, Seq(target)), s.name)))
      case "groupCount" =>
        // expects .by('k') next; handled by peeking in by()? simpler: mark
        // via pendingOrder-like state is overkill — require .by immediately.
        val next = steps.lift(idx + 1)
        require(next.exists(_.name == "by"), "groupCount() requires .by(key)")
        val key = next.get.args.head.asInstanceOf[String]
        op = Op.Aggregate(op, Seq((Expr.Prop(cur, key), key)),
          Seq((Expr.Func("count", Seq(Expr.Lit("*"))), "count")))
        consumedBy = idx + 1
      case "valueMap" =>
        op = Op.Project(op, Seq(
          (Expr.Func("properties", Seq(Expr.Var(cur))), "valueMap")))
        valueCol = Some("valueMap")
      case "elementMap" =>
        throw new IllegalArgumentException("step elementMap not supported yet")
      case other =>
        throw new IllegalArgumentException(s"unknown gremlin step $other()")
    }
    op
  }
}
