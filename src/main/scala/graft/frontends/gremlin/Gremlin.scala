package graft.frontends.gremlin

import graft.graph.{Both, Direction, In, Out}
import graft.ir.{Expr, Op}

/** Gremlin front-end (SURVEY §2.8; reference
  * crates/grafeo-adapters/src/query/gremlin/ast.rs:19-187 +
  * gremlin_translator.rs). A traversal is a fold over steps into the shared
  * IR — each step transforms the current binding (the traverser position is
  * the IR variable `cur`).
  *
  * Supported steps: V, hasLabel, has(k[,v|pred]), hasNot(k), hasId(id…),
  * out/in/both(rel), outE/inE/bothE(rel) + inV/outV/otherV (edge-position
  * traversal), values, id, label, dedup, limit, skip, range,
  * order().by(k[, decr]), count, sum, mean, min, max, fold/unfold,
  * groupCount().by(k), group().by(k).by(agg), as(name),
  * select(a,b,…).by(prop)…, project(a,b,…).by(k)…, path(), valueMap(k…),
  * elementMap(k…), where(pred), and/or/not(pred…),
  * coalesce(values|constant…), choose(pred, v1, v2), union(out/in/both…),
  * bothV, constant(v), optional(out/in/both), store/aggregate(label),
  * sideEffect(store/aggregate(label)), cap(label), filter(pred).
  * Predicates: eq, neq, gt, gte, lt, lte, within, without, between, inside,
  * outside, containing, startingWith, endingWith, regex, has, hasLabel, and,
  * or, not (with or without the `P.`/`TextP.` prefix); eq/neq against an
  * as()-alias compares traverser positions.
  */
object GremlinFrontend {

  final case class St(name: String, args: Seq[Any]) // parsed step
  private[gremlin] final case class Pred(op: String, values: Seq[Any])

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
          // backslash escapes, same as the Cypher/SPARQL lexers — a quote
          // inside a property value must not terminate the literal
          while (i < n && q(i) != quote) {
            if (q(i) == '\\') i = graft.frontends.Lexing.readEscape(q, i, sb)
            else { sb += q(i); i += 1 }
          }
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
          var name = ident()
          ws()
          // P.gt(5) / TextP.containing('x') — the statically-imported form
          // drops the class prefix; accept both (gremlin/ast.rs:172-187)
          if ((name == "P" || name == "TextP") && i < n && q(i) == '.') {
            i += 1
            name = ident()
            ws()
          }
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
  def translate(q: String): Op.T = translateSteps(parseSteps(q))._1

  /** Fold a step list into IR; also returns the final traverser variable
    * (the node-position binding GremlinUpdates needs for property()/drop()).
    */
  private[gremlin] def translateSteps(steps: Seq[St]): (Op.T, String) = {
    require(steps.nonEmpty && (steps.head.name == "V" || steps.head.name == "E"),
      "traversal must start with g.V() or g.E()")
    var anon = 0
    // no "__" in traverser vars: natural joins key on plain variable columns
    // and treat `v__prop` columns as property bindings
    def fresh(): String = { anon += 1; s"gx$anon" }
    var cur = fresh()
    var op: Op.T = Op.NodeScan(cur, None)

    var valueCol: Option[String] = None // set once values()/id() projected
    // store('x')/aggregate('x') side-effect collections: label → the plan
    // and value expression AT THE STORE STEP (later filters must not shrink
    // the stored collection — the TinkerPop contract), read back by cap()
    val sideEffects = scala.collection.mutable.Map.empty[String, (Op.T, Expr.E)]
    var pendingOrder = false
    var consumedBy = -1 // index of a by() already folded into groupCount()
    val consumedBys = scala.collection.mutable.Set.empty[Int] // by()s folded into select()
    val aliases = scala.collection.mutable.Map.empty[String, String] // as-name -> IR var
    val visited = scala.collection.mutable.ArrayBuffer.empty[String] // traverser path
    // edge-position traversal state after E()/outE/inE/bothE: the edge var,
    // the expansion target (what otherV binds), and the true source/target
    // node vars — None after bothE, whose union branches disagree on sides
    case class EdgePos(ev: String, target: String,
        srcV: Option[String], dstV: Option[String])
    var edgeCur: Option[EdgePos] = None

    def dirOf(name: String) = name match {
      case "out" | "outE" => Out
      case "in" | "inE"   => In
      case _              => Both
    }

    def predExpr(colE: Expr.E, v: Any): Expr.E = v match {
      case Pred("eq", vs)  => Expr.Bin("=", colE, Expr.Lit(vs.head))
      case Pred("neq", vs) => Expr.Bin("<>", colE, Expr.Lit(vs.head))
      case Pred("gt", vs)  => Expr.Bin(">", colE, Expr.Lit(vs.head))
      case Pred("gte", vs) => Expr.Bin(">=", colE, Expr.Lit(vs.head))
      case Pred("lt", vs)  => Expr.Bin("<", colE, Expr.Lit(vs.head))
      case Pred("lte", vs) => Expr.Bin("<=", colE, Expr.Lit(vs.head))
      case Pred("within", vs) =>
        Expr.Bin("in", colE, Expr.ListLit(vs.map(Expr.Lit)))
      case Pred("without", vs) =>
        Expr.Not(Expr.Bin("in", colE, Expr.ListLit(vs.map(Expr.Lit))))
      // between is [start, end) and inside is (start, end) — TinkerPop
      // semantics, ref gremlin/ast.rs:172-187
      case Pred("between", Seq(lo, hi)) =>
        Expr.Bin("and", Expr.Bin(">=", colE, Expr.Lit(lo)),
          Expr.Bin("<", colE, Expr.Lit(hi)))
      case Pred("inside", Seq(lo, hi)) =>
        Expr.Bin("and", Expr.Bin(">", colE, Expr.Lit(lo)),
          Expr.Bin("<", colE, Expr.Lit(hi)))
      case Pred("outside", Seq(lo, hi)) =>
        Expr.Bin("or", Expr.Bin("<", colE, Expr.Lit(lo)),
          Expr.Bin(">", colE, Expr.Lit(hi)))
      case Pred("containing", Seq(sub))    => Expr.Bin("contains", colE, Expr.Lit(sub))
      case Pred("startingWith", Seq(pre))  => Expr.Bin("startswith", colE, Expr.Lit(pre))
      case Pred("endingWith", Seq(suf))    => Expr.Bin("endswith", colE, Expr.Lit(suf))
      case Pred("regex", Seq(pat))         => Expr.Bin("=~", colE, Expr.Lit(pat))
      case Pred("and", vs) => vs.map(predExpr(colE, _)).reduce(Expr.Bin("and", _, _))
      case Pred("or", vs)  => vs.map(predExpr(colE, _)).reduce(Expr.Bin("or", _, _))
      case Pred("not", Seq(x)) => Expr.Not(predExpr(colE, x))
      case lit2 => Expr.Bin("=", colE, Expr.Lit(lit2))
    }

    /** Predicate for where()/and()/or()/not() steps (gremlin/ast.rs:19-187):
      * eq/neq against an as()-alias compares traverser positions; has-style
      * predicates and boolean combinators nest.
      */
    def wherePred(cur2: String, v: Any): Expr.E = v match {
      case Pred(cmp @ ("eq" | "neq"), Seq(a: String)) if aliases.contains(a) =>
        Expr.Bin(if (cmp == "eq") "=" else "<>", Expr.Var(cur2), Expr.Var(aliases(a)))
      case Pred("has", Seq(k: String)) =>
        Expr.IsNull(Expr.Prop(cur2, k), negated = true)
      case Pred("has", Seq(k: String, pv)) => predExpr(Expr.Prop(cur2, k), pv)
      case Pred("hasNot", Seq(k: String)) =>
        Expr.IsNull(Expr.Prop(cur2, k), negated = false)
      case Pred("hasLabel", Seq(l)) =>
        Expr.Bin("in", Expr.Lit(l), Expr.Func("labels", Seq(Expr.Var(cur2))))
      case Pred("and", vs) => vs.map(wherePred(cur2, _)).reduce(Expr.Bin("and", _, _))
      case Pred("or", vs)  => vs.map(wherePred(cur2, _)).reduce(Expr.Bin("or", _, _))
      case Pred("not", Seq(x)) => Expr.Not(wherePred(cur2, x))
      case other => throw new IllegalArgumentException(
        s"unsupported where()/boolean predicate: $other")
    }

    /** Scalar sub-traversals usable inside coalesce()/choose(). */
    def valTraversal(cur2: String, a: Any): Expr.E = a match {
      case Pred("values", Seq(k: String)) => Expr.Prop(cur2, k)
      case Pred("constant", Seq(v))       => Expr.Lit(v)
      case v @ (_: String | _: Long | _: Double | _: Boolean) => Expr.Lit(v)
      case other => throw new IllegalArgumentException(
        s"expected values(k)/constant(v), got $other")
    }

    for ((s, idx) <- steps.zipWithIndex) s.name match {
      case "V" =>
        require(idx == 0, "V() only at the start")
        visited += cur
      case "E" =>
        // edge scan: every edge once via its source (gremlin/ast.rs E step)
        require(idx == 0, "E() only at the start")
        val to = fresh()
        val ev = fresh()
        op = Op.Expand(op, cur, s.args.map(_.asInstanceOf[String]),
          to, Out, None, Some(ev))
        edgeCur = Some(EdgePos(ev, to, Some(cur), Some(to)))
      case "hasLabel" =>
        op = Op.Filter(op, Expr.Bin("in", Expr.Lit(s.args.head),
          Expr.Func("labels", Seq(Expr.Var(cur)))))
      case "has" if s.args.size == 1 =>
        op = Op.Filter(op, Expr.IsNull(
          Expr.Prop(cur, s.args.head.asInstanceOf[String]), negated = true))
      case "has" =>
        val key = s.args.head.asInstanceOf[String]
        op = Op.Filter(op, predExpr(Expr.Prop(cur, key), s.args(1)))
      case "hasNot" =>
        op = Op.Filter(op, Expr.IsNull(
          Expr.Prop(cur, s.args.head.asInstanceOf[String]), negated = false))
      case "hasKey" =>
        // hasKey('k', …): element carries ALL the property keys (ast.rs HasKey)
        op = s.args.foldLeft(op)((acc, k) => Op.Filter(acc, Expr.IsNull(
          Expr.Prop(cur, k.asInstanceOf[String]), negated = true)))
      case "identity" => () // pass-through traverser (ast.rs Identity)
      case "hasId" =>
        op = Op.Filter(op, Expr.Bin("in", Expr.Var(cur),
          Expr.ListLit(s.args.map(Expr.Lit))))
      case "out" | "in" | "both" =>
        val to = fresh()
        op = Op.Expand(op, cur, s.args.map(_.asInstanceOf[String]),
          to, dirOf(s.name), None)
        cur = to
        visited += to
      case "outE" | "inE" | "bothE" =>
        // traverser moves onto the edge: bind edge var now, node var pending
        val to = fresh()
        val ev = fresh()
        val d = dirOf(s.name)
        op = Op.Expand(op, cur, s.args.map(_.asInstanceOf[String]),
          to, d, None, Some(ev))
        edgeCur = Some(d match {
          case Out  => EdgePos(ev, to, Some(cur), Some(to))
          case In   => EdgePos(ev, to, Some(to), Some(cur))
          case Both => EdgePos(ev, to, None, None)
        })
      case "bothV" =>
        // both endpoints of the edge (gremlin/ast.rs:50): the traverser
        // branches — bag union of the two endpoint bindings, then a natural
        // join against the node table re-binds the endpoint's properties
        val pos2 = edgeCur.getOrElse(
          throw new IllegalArgumentException("bothV() only after E()/outE()/inE()/bothE()"))
        (pos2.srcV, pos2.dstV) match {
          case (Some(sv), Some(dv)) =>
            val bv = fresh()
            op = Op.NaturalJoin(
              Op.UnionAll(Op.Bind(op, Expr.Var(sv), bv), Op.Bind(op, Expr.Var(dv), bv)),
              Op.NodeScan(bv, None))
            cur = bv
            visited += bv
            edgeCur = None
          case _ => throw new IllegalArgumentException(
            "bothV() after bothE() would re-emit both sides of both directions — use otherV()")
        }
      case "inV" | "outV" | "otherV" =>
        val pos2 = edgeCur.getOrElse(
          throw new IllegalArgumentException(s"${s.name}() only after E()/outE()/inE()/bothE()"))
        def side(o: Option[String]): String = o.getOrElse(
          throw new IllegalArgumentException(
            s"${s.name}() after bothE() is ambiguous — use otherV()"))
        cur = s.name match {
          case "otherV" => pos2.target
          case "inV"    => side(pos2.dstV)
          case "outV"   => side(pos2.srcV)
        }
        visited += cur
        edgeCur = None
      case "values" =>
        val key = s.args.head.asInstanceOf[String]
        val owner = edgeCur.map(_.ev).getOrElse(cur) // edge position reads edge props
        op = Op.Project(op, Seq((Expr.Prop(owner, key), key)))
        valueCol = Some(key)
      case "label" =>
        val owner = edgeCur.map(_.ev).getOrElse(cur)
        val e: Expr.E =
          if (edgeCur.isDefined) Expr.Func("type", Seq(Expr.Var(owner)))
          else Expr.Func("labels", Seq(Expr.Var(owner)))
        op = Op.Project(op, Seq((e, "label")))
        valueCol = Some("label")
      case "id" =>
        op = Op.Project(op, Seq((Expr.Var(cur), "id")))
        valueCol = Some("id")
      case "shuffle" =>
        // seeded deterministic order (ref gremlin/ast.rs:94 Shuffle): sort
        // by a 64-bit hash of the traverser value — stable across runs and
        // cluster layouts (a physical-random order would be untestable and
        // non-reproducible), "random" with respect to any natural order.
        // An optional numeric argument reseeds: shuffle(7).
        val seed = s.args.headOption.map(_.asInstanceOf[Long]).getOrElse(42L)
        val target: Expr.E = valueCol.map(Expr.Var(_): Expr.E).getOrElse(Expr.Var(cur))
        op = Op.Sort(op, Seq(
          (Expr.Func("hash64", Seq(Expr.Lit(seed), target)), true),
          (target, true))) // hash-collision tie-break keeps total determinism
      case "properties" =>
        // property objects (ref gremlin/ast.rs:262): one traverser per
        // PRESENT property as a {key, value} struct; key()/value() project
        // out of it. With explicit keys the objects come from the typed
        // columns; bare properties() walks the full property map (typed +
        // dynamic, the same view valueMap() returns). Values are strings —
        // the schemaless Value view, uniform across keys of mixed types.
        val owner = edgeCur.map(_.ev).getOrElse(cur)
        val arr: Expr.E =
          if (s.args.nonEmpty)
            Expr.ListLit(s.args.map(_.asInstanceOf[String]).map(k =>
              Expr.MapLit(Seq(
                "key" -> Expr.Lit(k),
                "value" -> Expr.Func("tostring", Seq(Expr.Prop(owner, k)))))))
          else Expr.Func("map_entries",
            Seq(Expr.Func("properties", Seq(Expr.Var(owner)))))
        op = Op.Project(op, Seq((arr, "property")))
        op = Op.Unwind(op, Expr.Var("property"), "property")
        // an absent property yields no object (TinkerPop semantics)
        op = Op.Filter(op, Expr.IsNull(
          Expr.Func("field", Seq(Expr.Var("property"), Expr.Lit("value"))),
          negated = true))
        valueCol = Some("property")
      case "key" | "value" =>
        val target = valueCol.getOrElse(throw new IllegalArgumentException(
          s"${s.name}() needs properties() first"))
        op = Op.Project(op, Seq(
          (Expr.Func("field", Seq(Expr.Var(target), Expr.Lit(s.name))), s.name)))
        valueCol = Some(s.name)
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
        steps.lift(idx + 1) match {
          case Some(St("by", Seq(key: String))) =>
            op = Op.Aggregate(op, Seq((Expr.Prop(cur, key), key)),
              Seq((Expr.Func("count", Seq(Expr.Lit("*"))), "count")))
            consumedBy = idx + 1
          case _ =>
            // bare groupCount(): group by the traverser VALUE itself (the
            // Gremlin map-of-value→count form, e.g. after choose/constant)
            val v = valueCol.map(Expr.Var(_): Expr.E).getOrElse(Expr.Var(cur))
            op = Op.Aggregate(op, Seq((v, "key")),
              Seq((Expr.Func("count", Seq(Expr.Lit("*"))), "count")))
            valueCol = Some("key")
        }
      case "valueMap" =>
        op = Op.Project(op, Seq(
          (Expr.Func("properties", Seq(Expr.Var(cur))), "valueMap")))
        valueCol = Some("valueMap")
      case "elementMap" =>
        // id + label + requested property keys as a struct column
        val ks = s.args.map(_.asInstanceOf[String])
        val items = Seq(
          ("id", Expr.Var(cur): Expr.E),
          ("label", Expr.Func("head", Seq(Expr.Func("labels", Seq(Expr.Var(cur))))): Expr.E)) ++
          ks.map(k => (k, Expr.Prop(cur, k): Expr.E))
        op = Op.Project(op, Seq((Expr.MapLit(items), "elementMap")))
        valueCol = Some("elementMap")
      case "fold" =>
        val target = valueCol.getOrElse(
          throw new IllegalArgumentException("fold() needs values()/id() first"))
        op = Op.Aggregate(op, Seq.empty,
          Seq((Expr.Func("collect", Seq(Expr.Var(target))), target)))
      case "unfold" =>
        val target = valueCol.getOrElse(
          throw new IllegalArgumentException("unfold() needs a folded column"))
        op = Op.Unwind(op, Expr.Var(target), target)
      case "group" =>
        // group().by(key)[.by(count()|sum(k)|mean(k)|min(k)|max(k))]
        val next = steps.lift(idx + 1)
        require(next.exists(_.name == "by"), "group() requires .by(key)")
        val key = next.get.args.head.asInstanceOf[String]
        consumedBys += idx + 1
        val (aggE, aggName): (Expr.E, String) = steps.lift(idx + 2) match {
          case Some(St("by", Seq(Pred("count", _)))) =>
            consumedBys += idx + 2
            (Expr.Func("count", Seq(Expr.Lit("*"))), "count")
          case Some(St("by", Seq(Pred(fn @ ("sum" | "mean" | "min" | "max"), fargs)))) =>
            consumedBys += idx + 2
            val f2 = if (fn == "mean") "avg" else fn
            (Expr.Func(f2, Seq(Expr.Prop(cur, fargs.head.asInstanceOf[String]))), fn)
          case _ => // value side defaults to the collected traversers
            (Expr.Func("collect", Seq(Expr.Var(cur))), "value")
        }
        op = Op.Aggregate(op, Seq((Expr.Prop(cur, key), key)), Seq((aggE, aggName)))
        valueCol = Some(key)
      case "project" =>
        val names = s.args.map(_.asInstanceOf[String])
        val bys = Iterator.from(idx + 1)
          .takeWhile(j => steps.lift(j).exists(_.name == "by"))
          .map(j => { consumedBys += j; steps(j).args.head.asInstanceOf[String] })
          .toSeq
        require(bys.size == names.size, "project() needs one by(key) per name")
        op = Op.Project(op, names.zip(bys).map { case (nm, k) =>
          (Expr.Prop(cur, k): Expr.E, nm) })
        valueCol = Some(names.head)
      case "where" | "filter" =>
        // traversal conditions (gremlin/ast.rs:19-187 anonymous traversals):
        // where(out('T')) keeps traversers WITH a match — a semi join, the
        // set-based equivalent of per-traverser sub-traversal evaluation;
        // where(not(out('T'))) is the anti join
        s.args.head match {
          case Pred(d @ ("out" | "in" | "both"), args2) =>
            val sub = Op.Expand(Op.NodeScan(cur, None), cur,
              args2.map(_.asInstanceOf[String]), fresh(), dirOf(d), None)
            op = Op.SemiNaturalJoin(op, sub)
          case Pred("not", Seq(Pred(d @ ("out" | "in" | "both"), args2))) =>
            val sub = Op.Expand(Op.NodeScan(cur, None), cur,
              args2.map(_.asInstanceOf[String]), fresh(), dirOf(d), None)
            op = Op.AntiNaturalJoin(op, sub)
          case a => op = Op.Filter(op, wherePred(cur, a))
        }
      case "and" | "or" | "not" =>
        op = Op.Filter(op, wherePred(cur, Pred(s.name, s.args)))
      case "coalesce" =>
        op = Op.Project(op, Seq(
          (Expr.Func("coalesce", s.args.map(valTraversal(cur, _))), "v")))
        valueCol = Some("v")
      case "choose" =>
        // the condition is a boolean predicate OR an anonymous traversal
        // (choose(out('T'), t, f) branches on sub-traversal non-emptiness —
        // compiled as a correlated count, so it stays one distributed plan)
        val (op2, condE) = s.args.head match {
          case Pred(d @ ("out" | "in" | "both"), args2) =>
            val c = fresh()
            val sub = Op.Expand(Op.NodeScan(cur, None), cur,
              args2.map(_.asInstanceOf[String]), fresh(), dirOf(d), None)
            (Op.CorrelatedCount(op, sub, c),
              Expr.Bin(">", Expr.Var(c), Expr.Lit(0L)))
          case pred => (op, wherePred(cur, pred))
        }
        op = Op.Project(op2, Seq((Expr.CaseW(
          Seq((condE, valTraversal(cur, s.args(1)))),
          Some(valTraversal(cur, s.args(2)))), "v")))
        valueCol = Some("v")
      case "constant" =>
        // replace the traverser value, keep cardinality (gremlin/ast.rs:96)
        op = Op.Project(op, Seq((Expr.Lit(s.args.head), "constant")))
        valueCol = Some("constant")
      case "optional" =>
        // optional(out('T')): move if the sub-traversal matches, stay put
        // otherwise (gremlin/ast.rs:128) — a correlated left-outer expand,
        // then coalesce back to the origin and re-bind node properties
        s.args.head match {
          case Pred(d @ ("out" | "in" | "both"), args2) =>
            val to = fresh()
            val nv = fresh()
            val sub = Op.Expand(Op.NodeScan(cur, None), cur,
              args2.map(_.asInstanceOf[String]), to, dirOf(d), None)
            op = Op.NaturalJoin(
              Op.Bind(Op.LeftNaturalJoin(op, sub),
                Expr.Func("coalesce", Seq(Expr.Var(to), Expr.Var(cur))), nv),
              Op.NodeScan(nv, None))
            cur = nv
            visited += nv
          case other => throw new IllegalArgumentException(
            s"optional() supports out()/in()/both() bodies, got $other")
        }
      case "store" | "aggregate" =>
        // side-effect collection (gremlin/ast.rs:140,142): snapshot the plan
        // and current value; the traverser stream continues unchanged.
        // aggregate() is store() plus an eager barrier — equivalent under
        // set-based execution.
        sideEffects(s.args.head.asInstanceOf[String]) =
          (op, valueCol.map(Expr.Var(_): Expr.E).getOrElse(Expr.Var(cur)))
      case "sideEffect" =>
        // sideEffect(traversal) (gremlin/ast.rs:137-138): only collection
        // side effects are observable in a set-based engine
        s.args.head match {
          case Pred("store" | "aggregate", Seq(lbl: String)) =>
            sideEffects(lbl) =
              (op, valueCol.map(Expr.Var(_): Expr.E).getOrElse(Expr.Var(cur)))
          case other => throw new IllegalArgumentException(
            s"sideEffect() supports store()/aggregate() bodies, got $other")
        }
      case "cap" =>
        // read a side-effect collection back as the single traverser value;
        // sorted for deterministic output (TinkerPop order is traversal
        // order, unreproducible in a distributed engine)
        val lbl = s.args.head.asInstanceOf[String]
        val (plan, e) = sideEffects.getOrElse(lbl,
          throw new IllegalArgumentException(s"cap('$lbl') has no store()/aggregate('$lbl')"))
        op = Op.Aggregate(plan, Seq.empty,
          Seq((Expr.Func("sort", Seq(Expr.Func("collect", Seq(e)))), lbl)))
        valueCol = Some(lbl)
      case "repeat" =>
        // repeat(out/in/both(rel)).times(n) → exactly-n-hop var-length walk
        val nxt = steps.lift(idx + 1)
        require(nxt.exists(_.name == "times"), "repeat() requires .times(n)")
        val n = nxt.get.args.head.asInstanceOf[Long].toInt
        consumedBys += idx + 1
        s.args.head match {
          case Pred(d @ ("out" | "in" | "both"), args2) =>
            val to = fresh()
            op = Op.VarExpand(op, cur, args2.map(_.asInstanceOf[String]),
              to, dirOf(d), n, n, None)
            cur = to
            visited += to
          case other => throw new IllegalArgumentException(
            s"repeat() supports out()/in()/both() bodies, got $other")
        }
      case "times" if consumedBys.contains(idx) => () // folded into repeat()
      case "union" =>
        // union(out('A'), in('B'), …): same far-side var in every branch so
        // the bag union is schema-aligned
        val to = fresh()
        val branches = s.args.map {
          case Pred(d @ ("out" | "in" | "both"), args2) =>
            Op.Expand(op, cur, args2.map(_.asInstanceOf[String]),
              to, dirOf(d), None): Op.T
          case other => throw new IllegalArgumentException(
            s"union() supports out()/in()/both() branches, got $other")
        }
        op = branches.reduce(Op.UnionAll(_, _))
        cur = to
        visited += to
      case other =>
        throw new IllegalArgumentException(s"unknown gremlin step $other()")
    }
    (op, cur)
  }
}
