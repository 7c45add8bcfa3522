package graft.compiler

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import graft.ir.{Expr, Op}

/** Lowers the shared IR (graft.ir) to a declarative DataFrame plan — the
  * Spark-native replacement for the reference's physical planner
  * (crates/grafeo-engine/src/query/planner.rs). All optimization (pushdown,
  * join selection, reorder, AQE) is delegated to Catalyst: we emit the most
  * declarative plan we can and never materialize on the driver.
  *
  * Binding encoding: one DataFrame column per bound variable. A node variable
  * `n` occupies column `n` (the node id) plus `n__<prop>` columns for its
  * properties (the property-table layout of SURVEY §1.3) — so property
  * access is a plain column reference that prunes down to the parquet scan.
  */
final class Compiler(spark: SparkSession, graph: PropertyGraph) {

  private val propCols: Seq[String] = graph.nodes.columns.filterNot(_ == "id").toSeq
  // schemaless fallback (SURVEY §1.3 hybrid; reference Value map,
  // graph/lpg/store.rs:176-182): properties outside the typed columns live
  // in an optional `props` map column; reads fall back to element_at
  private val edgePropSet: Set[String] =
    graph.edges.columns.filterNot(c => c == "src" || c == "dst").toSet
  // edge variables bound during the CURRENT compile (Op.Expand edgeVar) —
  // the props fallback must gate per element kind: a node variable only
  // has a `v__props` column when the NODE table carries one, and vice
  // versa. Scoped per top-level compile() call: a session reuses one
  // Compiler across queries, and a name used as an edge var in one query
  // must not poison the same name used as a node var in the next.
  private val edgeVars = scala.collection.mutable.Set.empty[String]
  private def dynPropsFor(v: String): Boolean =
    if (edgeVars.contains(v)) edgePropSet.contains("props")
    else propCols.contains("props")

  // node variables whose property/label columns are provably never read in
  // the current plan (Compiler.prunableNodeVars) — their node join is elided
  private var prunable: Set[String] = Set.empty

  def compile(op: Op.T): DataFrame = {
    // data-driven cycle-split proposals noted by the frontend (flag off):
    // evaluated here because the fanout estimate needs the graph; logs
    // only, never changes the plan
    graft.frontends.cypher.CycleAdvisor.evaluate(graph.nodes, graph.edges)
    edgeVars.clear()
    prunable =
      if (spark.conf.get("spark.graft.pruneNodeJoins", "true").toBoolean)
        Compiler.prunableNodeVars(op)
      else Set.empty
    compileRec(op)
  }

  private def nodeFor(v: String, label: Option[String]): DataFrame = {
    val base = label.map(graph.nodesWithLabel).getOrElse(graph.nodes)
    if (prunable(v)) base.select(col("id").as(v))
    else base.select(col("id").as(v) +: propCols.map(c => col(c).as(s"${v}__$c")): _*)
  }

  /** Attach the expand target's node bindings. When the analysis proved the
    * variable's properties are never read, the per-hop node join is dead
    * weight — a whole shuffle join at scale — and is dropped: unlabeled
    * targets need no join at all (edge endpoints always reference live nodes,
    * the store invariant Mutations maintains — non-detach delete refuses
    * attached nodes, detach delete removes the edges), labeled ones a
    * semi-join against the label's ids.
    */
  private def attachTarget(df: DataFrame, to: String, label: Option[String]): DataFrame =
    if (prunable(to) && label.isEmpty) df
    else if (prunable(to))
      df.join(graph.nodesWithLabel(label.get).select(col("id").as(to)),
        Seq(to), "left_semi")
    else df.join(nodeFor(to, label).withColumnRenamed(to, "__tid"),
        col(to) === col("__tid"))
      .drop("__tid")

  private def compileRec(op: Op.T): DataFrame = op match {
    case Op.NodeScan(v, label) => nodeFor(v, label)

    case Op.Expand(in, from, rel, to, dir, targetLabel, edgeVar) =>
      edgeVar.foreach(edgeVars += _)
      val df = in match {
        // unlabeled property-free source: node⨝edge is the identity (every
        // edge endpoint is a live node), so the pattern is a pure edge scan
        case Op.NodeScan(v, None) if v == from && prunable(v) =>
          graph.expandAll(from, rel, dir, to, edgeVar)
        case _ => graph.expand(compileRec(in), from, rel, dir, to, edgeVar)
      }
      attachTarget(df, to, targetLabel)

    case Op.VarExpand(in, from, rel, to, dir, min, max, targetLabel, hopsAs, pathAs, uniq) =>
      val df = compileRec(in)
      val sourcesDf = df.select(col(from)).distinct()
      val conf = graph.nodes.sparkSession.conf
      // spark.graft.varlen.uniqueness overrides the op's contract (perf
      // escape hatch: "nodes" restores the pre-edge-id simple-path walks)
      val mode = conf.getOption("spark.graft.varlen.uniqueness").getOrElse(uniq)
      // nodes(p), unbounded termination, and node-unique walks need the
      // path-carrying expand; bounded hop-only walks keep the cheaper
      // walk-pair loop — for edge-unique semantics it carries just the
      // used-edge-id array (one long per hop), not the node path.
      val walk0 =
        if (mode == "nodes" || pathAs.isDefined || max < 0) {
          val cap = conf.get("spark.graft.varlen.maxHops", "64").toInt
          val w = graph.varLengthExpandPaths(sourcesDf, from, rel, min, max, dir, cap,
            edgeUnique = mode == "edges")
          pathAs match {
            case Some(p) => w.withColumnRenamed("path", p)
            case None    => w.drop("path")
          }
        } else graph.varLengthExpand(sourcesDf, from, rel, min, max, dir,
          edgeUnique = mode == "edges")
      val walk = walk0.withColumnRenamed("dst", to)
      val pairs = hopsAs match {
        case Some(h) => walk.withColumnRenamed("hops", h)
        case None    => walk.drop("hops")
      }
      attachTarget(df.join(pairs, from), to, targetLabel)

    case Op.ShortestPath(in, from, rel, to, dir, maxHops, targetLabel, lenAs, pathAs, all) =>
      val df = compileRec(in)
      // distributed frontier BFS from the bound sources; dist is minimal by
      // construction (level-synchronous visited-set BFS)
      // maxHops < 0 = unbounded (plan.rs:195): BFS terminates naturally via
      // its visited set once the reachable closure is exhausted
      val sources = df.select(col(from)).distinct()
      val paths = pathAs match {
        case None =>
          graph.bfs(sources, from, rel,
              if (maxHops < 0) Int.MaxValue else maxHops, dir)
            .withColumnRenamed("dst", to)
            .withColumnRenamed("dist", "hops")
        case Some(p) =>
          // nodes(p) on shortestPath: level-synchronous BFS with
          // parent-pointer path reconstruction (PropertyGraph.bfsPaths) —
          // all minimal paths for allShortestPaths, else the
          // lexicographically smallest (the deterministic pick where
          // openCypher says "any one"). Same unbounded termination via the
          // visited set as the length-only branch — no hop cap divergence.
          graph.bfsPaths(sources, from, rel,
              if (maxHops < 0) Int.MaxValue else maxHops, dir, all)
            .withColumnRenamed("dst", to)
            .withColumnRenamed("path", p)
      }
      val withLen = lenAs match {
        case Some(n) => paths.withColumnRenamed("hops", n)
        case None    => paths.drop("hops")
      }
      attachTarget(df.join(withLen, from), to, targetLabel)

    case Op.Filter(in, pred) => compileRec(in).filter(expr(pred))

    // RETURN * / WITH *: every bound variable column (internal and property
    // columns carry "__" and stay hidden)
    case Op.Project(in, Seq((Expr.Var("*"), _))) =>
      val df = compileRec(in)
      val cols = df.columns.filterNot(_.contains("__"))
      require(cols.nonEmpty, "RETURN * has no bound variables")
      df.select(cols.map(col): _*)

    case Op.Project(in, items) =>
      compileRec(in).select(items.map { case (e, n) => expr(e).as(n) }: _*)

    case Op.Aggregate(in, keys, aggs) =>
      val df = compileRec(in)
      val aggCols = aggs.map { case (e, n) => aggExpr(e).as(n) }
      if (keys.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
      else df.groupBy(keys.map { case (e, n) => expr(e).as(n) }: _*)
        .agg(aggCols.head, aggCols.tail: _*)

    case Op.Sort(in, keys) =>
      compileRec(in).orderBy(keys.map { case (e, asc) =>
        if (asc) expr(e).asc_nulls_first else expr(e).desc_nulls_last }: _*)

    case Op.Limit(in, n)  => compileRec(in).limit(n.toInt)
    case Op.Skip(in, n)   => compileRec(in).offset(n.toInt)
    case Op.Distinct(in)  => compileRec(in).distinct()
    case Op.UnionAll(l, r) => compileRec(l).unionByName(compileRec(r))

    case Op.NaturalJoin(l, r) =>
      val (left, right, keys) = natJoinSides(compileRec(l), compileRec(r))
      if (keys.nonEmpty) left.join(right, keys) else left.crossJoin(right)

    case Op.LeftNaturalJoin(l, r) =>
      val (left, right, keys) = natJoinSides(compileRec(l), compileRec(r))
      require(keys.nonEmpty, "OPTIONAL MATCH must share a variable with the prior pattern")
      left.join(right, keys, "left_outer")

    case Op.SemiNaturalJoin(l, r) =>
      val (left, right, keys) = natJoinSides(compileRec(l), compileRec(r))
      require(keys.nonEmpty, "EXISTS { } subquery must share a variable with the outer query")
      left.join(right, keys, "left_semi")

    case Op.AntiNaturalJoin(l, r) =>
      val (left, right, keys) = natJoinSides(compileRec(l), compileRec(r))
      require(keys.nonEmpty, "NOT EXISTS { } subquery must share a variable with the outer query")
      left.join(right, keys, "left_anti")

    case Op.CorrelatedCount(in, sub, as) =>
      val left = compileRec(in)
      val right = compileRec(sub)
      val keys = left.columns.intersect(right.columns).filterNot(_.contains("__")).toSeq
      require(keys.nonEmpty, "COUNT { } subquery must share a variable with the outer query")
      // partial counts shuffle O(distinct keys); rows without a match get 0
      val counts = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as(as))
      left.join(counts, keys, "left_outer").na.fill(0L, Seq(as))

    case Op.Bind(in, e, as) => compileRec(in).withColumn(as, expr(e))

    case Op.CorrelatedCollect(in, sub, item, as) =>
      val left = compileRec(in)
      val right = compileRec(sub)
      val keys = left.columns.intersect(right.columns).filterNot(_.contains("__")).toSeq
      require(keys.nonEmpty, "pattern comprehension must share a variable with the outer query")
      // partial collects shuffle O(matches); rows without a match get []
      val lists = right.groupBy(keys.map(col): _*)
        .agg(sort_array(collect_list(expr(item))).as(as))
      val joined = left.join(lists, keys, "left_outer")
      joined.withColumn(as, coalesce(col(as), array().cast(joined.schema(as).dataType)))

    case Op.Unwind(in, list, as) =>
      val base = in match {
        case Op.OneRow => oneRow
        case other     => compileRec(other)
      }
      base.withColumn(as, explode(expr(list)))

    case Op.OneRow => oneRow
  }

  private def oneRow: DataFrame = spark.range(1).select(lit(1).as("__one"))

  /** Natural joins bind on shared *variable* columns only: the `v__prop`
    * columns are functionally dependent on the id, and joining on them
    * would wrongly treat NULL props as non-matching (NULL = NULL is false).
    * The right side drops its duplicate prop columns.
    */
  private def natJoinSides(dl: DataFrame, dr: DataFrame): (DataFrame, DataFrame, Seq[String]) = {
    val shared = dl.columns.intersect(dr.columns).toSeq
    val keys = shared.filterNot(_.contains("__"))
    if (keys.isEmpty) (dl, dr, shared)
    else (dl, shared.filter(_.contains("__")).foldLeft(dr)(_ drop _), keys)
  }

  /** LogicalExpression → Column, scalar context (plan.rs:862-968). `env`
    * carries lambda-bound variables (list comprehensions) that shadow
    * DataFrame columns.
    */
  def expr(e: Expr.E): Column = expr(e, Map.empty)
  private def expr(e: Expr.E, env: Map[String, Column]): Column =
    comp(e, expr(_, _), env)

  /** Constant-fold: Some(value) for a literal or any ROW-INDEPENDENT
    * expression (`lower('A@X.COM')`, `1 + 2`, `date('…')`) evaluated on a
    * one-row frame; None when the expression references row state —
    * variables, properties, parameters, subqueries — or the fold compiler
    * cannot handle it. The SINGLE folding used by typed unique probes
    * (GraftSession) and mutation property maps (CypherUpdates), so the
    * value a probe validated is always the value the mutation writes.
    */
  def constFold(e: Expr.E): Option[Any] = e match {
    case Expr.Lit(v) => Some(v)
    case other =>
      def rowDependent(a: Any): Boolean = a match {
        case Expr.Var(_) | Expr.Prop(_, _) | Expr.Param(_) |
            Expr.ExistsSub(_) | Expr.CountSub(_) => true
        case p: Product => p.productIterator.exists(rowDependent)
        case s: Iterable[_] => s.exists(rowDependent)
        case _ => false
      }
      if (rowDependent(other)) None
      else scala.util.Try(
        spark.range(1).select(expr(other)).head.get(0)).toOption
  }

  /** Aggregate-context expression (plan.rs:285-308): aggregate calls become
    * Spark aggregate Columns; scalar wrappers (round(avg(x),2)) compose on
    * top; anything else compiles as scalar (a grouping key reference).
    */
  def aggExpr(e: Expr.E): Column = aggExpr(e, Map.empty)
  private def aggExpr(e: Expr.E, env: Map[String, Column]): Column = e match {
    case Expr.Func(name, args, distinct)
        if Expr.aggregateFns.contains(name.toLowerCase) =>
      val n = name.toLowerCase
      def a0 = expr(args.head, env)
      n match {
        case "count" =>
          if (args.isEmpty || args.head == Expr.Lit("*")) count(lit(1))
          else if (distinct) countDistinct(a0) else count(a0)
        case "sum" => if (distinct) sum_distinct(a0) else sum(a0)
        case "avg" => avg(a0)
        case "min" => min(a0)
        case "max" => max(a0)
        case "collect" => if (distinct) collect_set(a0) else collect_list(a0)
        case "stdev" => stddev_samp(a0)
        case "stdevp" => stddev_pop(a0)
        case "percentilecont" => expr(args(1), env) match {
          case p => percentile_approx(a0, p, lit(1000000))
        }
        case "percentiledisc" => percentile_approx(a0, expr(args(1), env), lit(1000000))
        // deterministic forms of the SPARQL 1.1 additions (see Sparql.scala)
        case "group_concat" =>
          val sep = args.lift(1).collect { case Expr.Lit(s2) => s2.toString }.getOrElse(" ")
          array_join(sort_array(collect_list(a0.cast("string"))), sep)
        case "sample" => min(a0)
      }
    case other => comp(other, aggExpr(_, _), env)
  }

  /** Shared structural compile; `rec` chooses scalar vs aggregate context
    * for child expressions and threads the lambda environment.
    */
  private def comp(e: Expr.E, recEnv: (Expr.E, Map[String, Column]) => Column,
      env: Map[String, Column]): Column = {
    def rec(x: Expr.E): Column = recEnv(x, env)
    e match {
      case Expr.Lit(null)      => lit(null)
      case Expr.Lit(v)         => lit(v)
      case Expr.Var(n)         => env.getOrElse(n, col(n))
      case Expr.Prop(v, k)     =>
        // typed column if declared (node OR edge property); otherwise the
        // dynamic-map fallback when this variable's element kind carries one
        if (dynPropsFor(v) && !propCols.contains(k) && !edgePropSet.contains(k))
          element_at(col(s"${v}__props"), k)
        else col(s"${v}__$k")
      case Expr.Neg(x)         => -rec(x)
      case Expr.Not(x)         => !rec(x)
      case Expr.IsNull(x, neg) => if (neg) rec(x).isNotNull else rec(x).isNull
      case Expr.ListLit(items) => array(items.map(rec): _*)
      case Expr.Param(n) =>
        throw new IllegalArgumentException(s"unbound parameter: $$$n")
      case Expr.CaseW(branches, orElse) =>
        val first = when(rec(branches.head._1), rec(branches.head._2))
        val chained = branches.tail.foldLeft(first) { case (acc, (c, v)) =>
          acc.when(rec(c), rec(v)) }
        orElse.map(o => chained.otherwise(rec(o))).getOrElse(chained)
      // [v IN list WHERE p | m] → filter/transform higher-order functions;
      // the lambda variable shadows any same-named column via `env`
      case Expr.ListComp(v, listE, whereE, mapE) =>
        val base = rec(listE)
        val filtered = whereE.map(w =>
          filter(base, x => recEnv(w, env + (v -> x)))).getOrElse(base)
        mapE.map(m => transform(filtered, x => recEnv(m, env + (v -> x))))
          .getOrElse(filtered)
      // all/any/none/single(v IN list WHERE p) → forall/exists HOFs
      case Expr.Quant(kind, v, listE, predE) =>
        val base = rec(listE)
        def pred(x: Column) = recEnv(predE, env + (v -> x))
        kind match {
          case "all"    => forall(base, pred)
          case "any"    => exists(base, pred)
          case "none"   => !exists(base, pred)
          case "single" => size(filter(base, x => pred(x))) === 1
        }
      // reduce(acc = init, v IN list | step) → aggregate HOF
      case Expr.Reduce(acc, initE, v, listE, stepE) =>
        aggregate(rec(listE), rec(initE),
          (a, x) => recEnv(stepE, env + (acc -> a) + (v -> x)))
      // Cypher 0-based index; negative = from the end (element_at semantics)
      case Expr.Idx(listE, iE) =>
        val cl = rec(listE); val ci = rec(iE)
        element_at(cl, when(ci >= 0, ci + 1).otherwise(ci).cast("int"))
      // l[f..t] → elements f (incl) to t (excl), 0-based
      case Expr.Slice(listE, fE, tE) =>
        val cl = rec(listE)
        val cf = fE.map(rec).getOrElse(lit(0)).cast("int")
        val ct = tE.map(rec).getOrElse(size(cl)).cast("int")
        slice(cl, cf + 1, greatest(ct - cf, lit(0)))
      case Expr.MapLit(items) =>
        struct(items.map { case (k, v) => rec(v).as(k) }: _*)
      case _: Expr.ExistsSub | _: Expr.CountSub | _: Expr.CollectSub =>
        throw new IllegalArgumentException(
          "EXISTS { } / COUNT { } subqueries and pattern comprehensions are " +
            "supported as WHERE conjuncts and RETURN/WITH items")
      case Expr.Bin(op, l, r) => binOp(op, rec(l), rec(r), r)
      case Expr.Func(name, args, _) => scalarFn(name.toLowerCase, args.map(rec), args)
    }
  }

  /** BinaryOp table (plan.rs:972-1021 → Catalyst equivalents). */
  private def binOp(op: String, cl: Column, cr: Column, rRaw: Expr.E): Column =
    op match {
      case "+"  => cl + cr
      case "-"  => cl - cr
      case "*"  => cl * cr
      case "/"  => cl / cr
      case "%"  => cl % cr
      case "^"  => pow(cl, cr)
      case "="  => cl === cr
      case "<>" => cl =!= cr
      case "<"  => cl < cr
      case "<=" => cl <= cr
      case ">"  => cl > cr
      case ">=" => cl >= cr
      case "and" => cl && cr
      case "or"  => cl || cr
      case "xor" => cl =!= cr
      case "startswith" => cl.startsWith(cr)
      case "endswith"   => cl.endsWith(cr)
      case "contains"   => cl.contains(cr)
      case "in" => rRaw match {
        case Expr.ListLit(items) if items.forall(_.isInstanceOf[Expr.Lit]) =>
          cl.isin(items.collect { case Expr.Lit(v) => v }: _*)
        case _ => array_contains(cr, cl)
      }
      case "=~" => rRaw match {
        case Expr.Lit(s: String) => cl.rlike(s)
        case _ => throw new IllegalArgumentException("regex pattern must be a string literal")
      }
      case other => throw new IllegalArgumentException(s"unknown operator $other")
    }

  /** Scalar function table (filter.rs:759-1050 eval_function;
    * planner_rdf.rs:1927-2350 — SURVEY §2.4/2.5). `size` is the list/array
    * form, `length`/`strlen` the string form.
    */
  private def scalarFn(name: String, cols: Seq[Column], raw: Seq[Expr.E]): Column = {
    def a0 = cols(0)
    def a1 = cols(1)
    def litStr(i: Int): String = raw(i) match {
      case Expr.Lit(s) => s.toString
      case other => throw new IllegalArgumentException(s"$name() arg $i must be a literal, got $other")
    }
    name match {
      case "id" => a0 // node/edge variables hold their id column
      case "properties" => raw.head match {
        // map of the variable's property columns (schemaless Value view,
        // SURVEY §1.3 map-column fallback) — keys sorted for determinism;
        // dynamic entries from the props map merge in (typed keys win on
        // collision via the map_filter guard)
        case Expr.Var(v) =>
          val props = propCols.filterNot(c => c == "labels" || c == "props").sorted
          val typed = map(props.flatMap(p2 =>
            Seq(lit(p2), col(s"${v}__$p2").cast("string"))): _*)
          if (!dynPropsFor(v)) typed
          else map_concat(
            map_filter(coalesce(col(s"${v}__props"), map()),
              (k, _) => !props.foldLeft(lit(false))((acc, p2) => acc || k === p2)),
            typed)
        case _ => throw new IllegalArgumentException("properties() needs a variable")
      }
      case "type" => raw.headOption.getOrElse(
        throw new IllegalArgumentException("type() needs an edge variable")) match {
        case Expr.Var(v) => col(s"${v}__rel") // edge variable binding
        case _ => throw new IllegalArgumentException("type() needs an edge variable")
      }
      case "labels" => raw.head match {
        case Expr.Var(v) => col(s"${v}__labels")
        case _ => throw new IllegalArgumentException("labels() needs a variable")
      }
      case "size"              => size(a0)
      case "length" | "strlen" => length(a0)
      // property existence (ref filter.rs:759-1050): exists(n.prop)
      case "exists"            => a0.isNotNull
      case "haslabel" => raw.head match {
        case Expr.Var(v) => array_contains(col(s"${v}__labels"), a1)
        case _ => throw new IllegalArgumentException("hasLabel() needs a node variable")
      }
      case "coalesce"  => coalesce(cols: _*)
      case "tostring"  => a0.cast("string")
      case "tointeger" | "toint" => a0.cast("long")
      case "tofloat"   => a0.cast("double")
      case "toboolean" => a0.cast("boolean")
      case "head"      => element_at(a0, 1)
      case "last"      => element_at(a0, -1)
      case "tail"      => slice(a0, lit(2), greatest(size(a0) - 1, lit(0)))
      case "reverse"   => reverse(a0)
      case "sort"      => sort_array(a0) // deterministic collection order (Gremlin cap())
      case "abs"       => abs(a0)
      case "round"     => if (cols.size > 1) round(a0, litStr(1).toInt) else round(a0)
      case "ceil"      => ceil(a0)
      case "floor"     => floor(a0)
      case "sqrt"      => sqrt(a0)
      case "toupper" | "upper" | "ucase" => upper(a0)
      case "tolower" | "lower" | "lcase" => lower(a0)
      case "trim"      => trim(a0)
      case "ltrim"     => ltrim(a0)
      case "rtrim"     => rtrim(a0)
      case "substring" | "substr" =>
        if (cols.size > 2) substring(a0, litStr(1).toInt, litStr(2).toInt)
        else a0.substr(a1, length(a0))
      case "left"      => substring(a0, 1, litStr(1).toInt)
      case "right"     => a0.substr(length(a0) - litStr(1).toInt + 1, lit(litStr(1).toInt))
      case "split"     => split(a0, java.util.regex.Pattern.quote(litStr(1)))
      case "replace"   => regexp_replace(a0, java.util.regex.Pattern.quote(litStr(1)), litStr(2))
      case "range"     => sequence(a0, a1, if (cols.size > 2) cols(2) else lit(1L))
      // vector surface (filter.rs:994-1050): vector() list→vector cast plus
      // the 4 distance functions as native codegen expressions
      // deterministic 64-bit hash — the Gremlin shuffle step's seeded order
      case "hash64"      => xxhash64(cols: _*)
      // map → array<struct<key,value>> — Gremlin properties() step objects
      case "map_entries" => map_entries(a0)
      // struct field access (property objects' key()/value())
      case "field"       => a0.getField(litStr(1))
      case "vector"             => a0.cast("array<float>")
      case "cosine_similarity"  => graft.functions.VectorFunctions.cosineSimilarity(a0, a1)
      case "euclidean_distance" => graft.functions.VectorFunctions.euclideanDistance(a0, a1)
      case "dot_product"        => graft.functions.VectorFunctions.dotProduct(a0, a1)
      case "manhattan_distance" => graft.functions.VectorFunctions.manhattanDistance(a0, a1)
      // relationships(p) over a node-id walk: consecutive (src, dst) pairs
      // (Path value logical_type.rs:14-88; edges carry no ids here)
      case "__path_rels" =>
        transform(slice(a0, lit(1), greatest(size(a0) - 1, lit(0))),
          (x, i) => struct(x.as("src"), element_at(a0, i + lit(2)).as("dst")))
      case other => throw new IllegalArgumentException(s"unknown function $other()")
    }
  }
}

object Compiler {
  import Expr.E

  /** Functions whose compilation reads `v__*` binding columns off a bare
    * variable argument (the comp() cases for properties/labels/hasLabel).
    * `type()` reads `v__rel`, an edge column the expand itself provides, so
    * it never forces the node join.
    */
  private val propFuncs = Set("properties", "labels", "haslabel")

  /** Node variables bound by `root` whose property/label columns are never
    * read. For these the compiler elides the per-hop target node join of
    * Expand/VarExpand/ShortestPath and the NodeScan property projection —
    * at 100 TB each elided join is a full shuffle of the node table saved.
    * Conservative gate: only active when the plan's schema is fixed by an
    * explicit projection root (Project/Aggregate under Sort/Limit/Skip/
    * Distinct/Filter wrappers), so bare-pattern plans — mutation match
    * prefixes, raw traversals whose callers read binding columns off the
    * DataFrame — keep full bindings.
    */
  def prunableNodeVars(root: Op.T): Set[String] = {
    if (!projectedRoot(root)) return Set.empty
    val bound = scala.collection.mutable.Set.empty[String]
    val needed = scala.collection.mutable.Set.empty[String]
    def seeExpr(e: E): Unit = {
      // identity rewrite as a traversal: visits every sub-expression,
      // including expressions inside Exists/Count/Collect sub-plans
      Expr.rewrite(e) {
        case p @ Expr.Prop(v, _) => needed += v; p
        case f @ Expr.Func(n, args, _) =>
          if (propFuncs(n.toLowerCase))
            args.foreach { case Expr.Var(v) => needed += v; case _ => () }
          f
        case other => other
      }
      ()
    }
    def walk(t: Op.T): Unit = t match {
      case Op.NodeScan(v, _)  => bound += v
      case e: Op.Expand       => bound += e.to; walk(e.input)
      case e: Op.VarExpand    => bound += e.to; walk(e.input)
      case e: Op.ShortestPath => bound += e.to; walk(e.input)
      case Op.Filter(in, p)   => seeExpr(p); walk(in)
      case Op.Project(in, items) => items.foreach(i => seeExpr(i._1)); walk(in)
      case Op.Aggregate(in, ks, as2) =>
        ks.foreach(i => seeExpr(i._1)); as2.foreach(i => seeExpr(i._1)); walk(in)
      case Op.Sort(in, ks)    => ks.foreach(k => seeExpr(k._1)); walk(in)
      case Op.Limit(in, _)    => walk(in)
      case Op.Skip(in, _)     => walk(in)
      case Op.Distinct(in)    => walk(in)
      case Op.UnionAll(l, r)         => walk(l); walk(r)
      case Op.NaturalJoin(l, r)      => walk(l); walk(r)
      case Op.LeftNaturalJoin(l, r)  => walk(l); walk(r)
      case Op.SemiNaturalJoin(l, r)  => walk(l); walk(r)
      case Op.AntiNaturalJoin(l, r)  => walk(l); walk(r)
      case Op.CorrelatedCount(in, sub, _) => walk(in); walk(sub)
      case Op.CorrelatedCollect(in, sub, item, _) =>
        seeExpr(item); walk(in); walk(sub)
      case Op.Bind(in, e, _)  => seeExpr(e); walk(in)
      case Op.Unwind(in, l, _) => seeExpr(l); walk(in)
      case Op.OneRow          => ()
    }
    walk(root)
    (bound -- needed).toSet
  }

  private def projectedRoot(t: Op.T): Boolean = t match {
    case _: Op.Project | _: Op.Aggregate => true
    case Op.Sort(in, _)    => projectedRoot(in)
    case Op.Limit(in, _)   => projectedRoot(in)
    case Op.Skip(in, _)    => projectedRoot(in)
    case Op.Distinct(in)   => projectedRoot(in)
    case Op.Filter(in, _)  => projectedRoot(in)
    case Op.UnionAll(l, r) => projectedRoot(l) && projectedRoot(r)
    case _                 => false
  }
}
