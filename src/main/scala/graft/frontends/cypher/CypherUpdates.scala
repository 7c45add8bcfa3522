package graft.frontends.cypher

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compiler.Compiler
import graft.graph.{Mutations, PropertyGraph}
import graft.ir.Expr

/** Executes Cypher update queries (reference cypher mutation clauses →
  * CreateNode/CreateEdge/SetProperty/Delete/Merge plan ops,
  * plan.rs:393-475/558-576): the reading prefix (MATCH/WHERE/…) binds rows
  * against the *input* graph snapshot, then mutation clauses apply in order
  * through the functional graft.graph.Mutations API.
  */
object CypherUpdates {
  import Ast._

  /** `keepEids = true` (transaction-internal) returns the eid-carrying
    * graph, so a FOLLOWING staged update reuses the assigned edge identity
    * instead of re-running the id window — the reference likewise assigns
    * edge ids once and mutates in place. Callers outside GraftTransaction
    * always get the eid-free form (stored graphs stay eid-free).
    */
  def run(spark: SparkSession, graph: PropertyGraph, query: String,
      keepEids: Boolean = false): PropertyGraph =
    runTracked(spark, graph, query, keepEids)._1

  /** [[run]], additionally returning the statement's touched-entity keys
    * (node `id`s, edge `(src, dst, rel)`s) when they are derivable from
    * the same bindings/predicates the mutations themselves consume — the
    * incremental write-set tracking of the reference's transaction manager
    * (transaction/manager.rs: a transaction records what it writes as it
    * writes, it never diffs snapshots). None when some clause's touch set
    * is not cheaply derivable (MERGE) — callers fall back to the diff.
    * The keys are a conservative SUPERSET of the rows that actually change
    * (a SET writing an unchanged value still counts), which OCC permits:
    * over-detect, never under-detect.
    */
  def runTracked(spark: SparkSession, graph: PropertyGraph, query: String,
      keepEids: Boolean = false): (PropertyGraph, Option[(DataFrame, DataFrame)]) = {
    val q = CypherFrontend.parse(query)
    val (readPrefix, actions) = q.clauses.span {
      case _: CreateClause | _: SetClause | _: DeleteClause | _: MergeClause |
          _: RemoveClause | _: RemovePropClause => false
      case _ => true
    }
    require(actions.nonEmpty, "no mutation clause; use cypher() for reads")
    require(actions.forall {
      case _: CreateClause | _: SetClause | _: DeleteClause | _: MergeClause |
          _: RemoveClause | _: RemovePropClause => true
      case _ => false
    }, "mutation clauses must come last")

    // the reading prefix compiles against the edge-id view (rel-var
    // re-binding needs eids), and the SAME eid-carrying graph threads
    // through every mutation clause: eids are assigned once here and ride
    // along as a column, so a later SET/REMOVE/DELETE on a rel var hits
    // exactly the edge the bindings identified. (Re-deriving ids per clause
    // is wrong — the tie-break hash over non-key columns changes when an
    // earlier clause rewrites an edge property, so parallel-edge ids could
    // swap mid-query.) The synthesized column is dropped once at the end,
    // so stored graphs stay eid-free.
    val gEid = graph.withEdgeIds
    val compiler = new Compiler(spark, gEid)
    lazy val bindings: DataFrame = {
      require(readPrefix.nonEmpty, "this mutation needs a MATCH prefix")
      compiler.compile(CypherFrontend.translate(Query(readPrefix)))
    }

    def seal(out: PropertyGraph): PropertyGraph =
      if (keepEids) out else out.copy(edges = out.edges.drop("eid"))
    pushdownEdgeMutations(gEid, readPrefix, actions) match {
      case Some((out, touchedEdges)) =>
        (seal(out), Some((gEid.nodes.select(col("id").cast("long").as("id")).limit(0),
          touchedEdges)))
      case None => pushdownNodeSet(gEid, readPrefix, actions) match {
        case Some((out, touchedNodes)) =>
          (seal(out), Some((touchedNodes,
            gEid.edges.select(col("src").cast("long").as("src"),
              col("dst").cast("long").as("dst"),
              col("rel").cast("string").as("rel")).limit(0))))
        case None =>
          val out = actions.foldLeft(gEid)((g, a) => apply(spark, compiler, g, bindings, a))
          (seal(out), touchedKeys(spark, compiler, gEid, bindings, actions))
      }
    }
  }

  /** Touched-entity keys of `actions` against the pre-mutation state, or
    * None when some clause's footprint is not derivable from its own
    * bindings (see [[runTracked]]). Lazy frames — nothing evaluates unless
    * a commit actually consumes the write set.
    */
  private def touchedKeys(spark: SparkSession, compiler: Compiler,
      g: PropertyGraph, bindings: => DataFrame,
      actions: Seq[Clause]): Option[(DataFrame, DataFrame)] = try {
    val nodeSets = Vector.newBuilder[DataFrame]
    val edgeSets = Vector.newBuilder[DataFrame]
    def nodeIdsOf(v: String): DataFrame = {
      if (!bindings.columns.contains(v)) throw Unsupported
      // OPTIONAL MATCH can bind v to null; the mutation's id join writes
      // nothing for those rows, so a null here is NOT a touched entity —
      // keeping it would null-safe-match another transaction's null and
      // raise a spurious write-write conflict
      bindings.select(col(v).cast("long").as("id")).where(col("id").isNotNull)
    }
    // key-column rewrites (SET n.id, SET r.rel, REMOVE n.id, n += {id:…})
    // change the entity's IDENTITY: the post-mutation key is not derivable
    // from the pre-mutation bindings, so a tracked set would under-count
    // and the merge-publish would drop the renamed row. Route them to the
    // snapshot-diff fallback, which sees both sides of the rename.
    def nodeKeyCol(k: String): Boolean = k == "id"
    def edgeKeyCol(k: String): Boolean =
      k == "src" || k == "dst" || k == "rel" || k == "eid"
    // eid-bound edge vars: recover (src, dst, rel) by membership against
    // the eid-threaded edge table the bindings were compiled over
    def edgeKeysOf(v: String): DataFrame =
      g.edges.join(bindings.select(col(s"${v}__eid").as("eid")).distinct(),
        Seq("eid"), "left_semi").select("src", "dst", "rel")
    for (a <- actions) a match {
      case CreateClause(path) if path.tail.isEmpty =>
        val idExpr = path.head.props.collectFirst { case ("id", e) => e }
          .getOrElse(throw Unsupported)
        val id = compiler.constFold(idExpr).getOrElse(throw Unsupported) match {
          case l: Long => l
          case i: Int  => i.toLong
          case _       => throw Unsupported
        }
        nodeSets += spark.range(id, id + 1).toDF("id")
      case CreateClause(path) =>
        if (path.tail.size != 1) throw Unsupported
        val (rel, dstPat) = path.tail.head
        val relType = rel.relTypes match {
          case Seq(t) => t
          case _      => throw Unsupported
        }
        val srcVar = path.head.v.getOrElse(throw Unsupported)
        val dstVar = dstPat.v.getOrElse(throw Unsupported)
        // OPTIONAL MATCH can bind either endpoint to null; CREATE writes no
        // edge for those rows (same as nodeIdsOf), and a null (src,dst) here
        // would null-safe-match another transaction's null-bound CREATE of
        // the same rel type — a spurious write-write abort
        edgeSets += bindings.select(col(srcVar).cast("long").as("src"),
          col(dstVar).cast("long").as("dst")).withColumn("rel", lit(relType))
          .where(col("src").isNotNull && col("dst").isNotNull)
      case SetClause(items) => items.foreach {
        case SetProp(Expr.Prop(v, k), _) =>
          if (isEdgeVar(bindings, v)) {
            if (edgeKeyCol(k)) throw Unsupported
            edgeSets += edgeKeysOf(v)
          } else {
            if (nodeKeyCol(k)) throw Unsupported
            nodeSets += nodeIdsOf(v)
          }
        case SetAllProps(v, Expr.MapLit(kvs), merge) =>
          // the replace form (`n = {map}`) never writes id (apply() expands
          // it over the non-key property columns); only the merge form can
          // smuggle a key rewrite in
          if (merge && kvs.exists { case (k, _) => nodeKeyCol(k) })
            throw Unsupported
          nodeSets += nodeIdsOf(v)
        case SetAllProps(_, _, _) => throw Unsupported // non-literal map
        case SetLabel(v, _)       => nodeSets += nodeIdsOf(v)
      }
      case RemoveClause(v, _) => nodeSets += nodeIdsOf(v)
      case RemovePropClause(v, prop) =>
        if (isEdgeVar(bindings, v)) {
          if (edgeKeyCol(prop)) throw Unsupported
          edgeSets += edgeKeysOf(v)
        } else {
          if (nodeKeyCol(prop)) throw Unsupported
          nodeSets += nodeIdsOf(v)
        }
      case DeleteClause(vars, detach) => vars.foreach { v =>
        if (isEdgeVar(bindings, v)) edgeSets += edgeKeysOf(v)
        else {
          val ids = nodeIdsOf(v)
          nodeSets += ids
          if (detach) {
            // DETACH also drops incident edges — both orientations
            edgeSets += g.edges.join(ids.withColumnRenamed("id", "src").distinct(),
              Seq("src"), "left_semi").select("src", "dst", "rel")
            edgeSets += g.edges.join(ids.withColumnRenamed("id", "dst").distinct(),
              Seq("dst"), "left_semi").select("src", "dst", "rel")
          }
        }
      }
      case _ => throw Unsupported // MERGE: match-or-create footprint needs its own probe
    }
    val emptyN = g.nodes.select(col("id").cast("long").as("id")).limit(0)
    val emptyE = g.edges.select(col("src"), col("dst"), col("rel")).limit(0)
    Some((nodeSets.result().foldLeft(emptyN)(_ unionByName _),
      edgeSets.result().foldLeft(emptyE)(_ unionByName _)))
  } catch {
    case Unsupported                                   => None
    case _: org.apache.spark.sql.AnalysisException     => None
  }

  private object Unsupported extends RuntimeException

  // ---- row-local expression analysis shared by the pushdown fast paths ----
  // Every property key an expression touches must be a TYPED column of the
  // table it will run against — a dynamic (props-map) key resolves only
  // through the compiler, so it must take the generic path; an unguarded
  // col(k) would fail analysis instead of falling back.
  private def refKeys(e: Expr.E): Set[String] = e match {
    case Expr.Prop(_, k)   => Set(k)
    case Expr.Not(x)       => refKeys(x)
    case Expr.Neg(x)       => refKeys(x)
    case Expr.Bin(_, l, r) => refKeys(l) ++ refKeys(r)
    case _                 => Set.empty
  }
  private def requireCols(e: Expr.E, cols: Array[String]): Unit =
    if (!refKeys(e).subsetOf(cols.toSet)) throw Unsupported
  private def refVars(e: Expr.E): Set[String] = e match {
    case Expr.Lit(_)        => Set.empty
    case Expr.Prop(v, _)    => Set(v)
    case Expr.Not(x)        => refVars(x)
    case Expr.Neg(x)        => refVars(x)
    case Expr.Bin(_, l, r)  => refVars(l) ++ refVars(r)
    case _                  => throw Unsupported // Var/Func/subqueries
  }
  // expression → Column over the referenced entity's own columns
  private def toCol(e: Expr.E): Column = e match {
    case Expr.Lit(v)     => lit(v)
    case Expr.Prop(_, k) => col(k)
    case Expr.Not(x)     => !toCol(x)
    case Expr.Neg(x)     => -toCol(x)
    case Expr.Bin(op, l, r) =>
      val (cl, cr) = (toCol(l), toCol(r))
      op match {
        case "="   => cl === cr
        case "<>"  => cl =!= cr
        case "<"   => cl < cr
        case "<="  => cl <= cr
        case ">"   => cl > cr
        case ">="  => cl >= cr
        case "and" => cl && cr
        case "or"  => cl || cr
        case "+"   => cl + cr
        case "-"   => cl - cr
        case "*"   => cl * cr
        case "/"   => cl / cr
        case "%"   => cl % cr
        case "startswith" => cl.startsWith(cr)
        case "endswith"   => cl.endsWith(cr)
        case "contains"   => cl.contains(cr)
        case _ => throw Unsupported
      }
    case _ => throw Unsupported
  }
  private def conjuncts(e: Expr.E): Seq[Expr.E] = e match {
    case Expr.Bin("and", l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Single-node SET pushdown: `MATCH (v:L {…}) [WHERE row-local-on-v]
    * SET v.p = expr, …` — the whole mutation is ONE conditional projection
    * over the node table. The generic path materializes the matched id set
    * and flag-joins it back (a distinct shuffle + a broadcast exchange per
    * commit-time evaluation); here the MATCH predicate itself becomes the
    * flag, so the plan is map-only — at corpus scale a predicate update
    * touches one scan instead of shuffling an id set, and the tracked OCC
    * write set is the same predicate as a filter projection. Falls back
    * (None) for anything not provably row-local: multi-pattern matches,
    * expansions, dynamic props-map keys, key-column rewrites, label items.
    */
  private def pushdownNodeSet(g: PropertyGraph, readPrefix: Seq[Clause],
      actions: Seq[Clause]): Option[(PropertyGraph, DataFrame)] = {
    val (pat, where) = readPrefix match {
      case Seq(MatchClause(Seq(PathPat(h, Seq(), None, None, false)), w, false)) =>
        (h, w)
      case _ => return None
    }
    // single action, same re-derivation argument as the edge pushdown
    if (actions.size != 1) return None
    val v = pat.v.getOrElse(return None)
    try {
      val labelPreds = (pat.label.toSeq ++ pat.extraLabels)
        .map(l => array_contains(col("labels"), l))
      val inline = pat.props.map { case (k, value) =>
        if (!g.nodes.columns.contains(k)) throw Unsupported
        if (!refVars(value).subsetOf(Set(v))) throw Unsupported
        requireCols(value, g.nodes.columns)
        col(k) === toCol(value)
      }
      val wherePreds = where.toSeq.flatMap(conjuncts).map { c =>
        if (!refVars(c).subsetOf(Set(v))) throw Unsupported
        requireCols(c, g.nodes.columns)
        toCol(c)
      }
      val cond = (labelPreds ++ inline ++ wherePreds)
        .reduceOption(_ && _).getOrElse(lit(true))
      val props = actions.head match {
        case SetClause(items) => items.map {
          case SetProp(Expr.Prop(`v`, k), value)
              if refVars(value).subsetOf(Set(v)) =>
            // id rewrites change entity identity (tracked set would miss
            // the renamed row); dynamic keys route to the props map —
            // both keep the generic path
            if (k == "id" || !g.nodes.columns.contains(k)) throw Unsupported
            requireCols(value, g.nodes.columns)
            k -> toCol(value)
          case _ => throw Unsupported
        }
        case _ => throw Unsupported
      }
      // Materialize the match ONCE as a flag column, like
      // Mutations.setNodeFieldsByIds' __hit: the fold below rewrites node
      // columns, so re-resolving `cond` against the mutated frame would
      // un-match rows whose predicate column an earlier item rewrote
      // (WHERE c.x > 5 SET c.x = 0, c.y = 'z' must still set c.y). A later
      // item's VALUE expression still sees earlier writes — same in-order
      // semantics as the generic path. Still map-only: one extra projection.
      val flagged = g.nodes.withColumn("__hit", cond)
      val mutated = props.foldLeft(flagged) { case (df, (k, value)) =>
        df.withColumn(k, when(col("__hit"), value).otherwise(col(k)))
      }.drop("__hit")
      // tracked OCC write set = the matched ids, from the PRE-mutation state
      val touched = g.nodes.filter(cond)
        .select(col("id").cast("long").as("id"))
        .where(col("id").isNotNull)
      Some((g.copy(nodes = mutated), touched))
    } catch { case Unsupported => None }
  }

  /** Predicate-pushdown fast path for rel-var mutations: a single-hop
    * `MATCH (a:A)-[r:T]->(b:B) WHERE …` whose WHERE splits into per-endpoint
    * / per-edge conjuncts, followed only by mutations of `r`, compiles to
    * one pass over the edge table with endpoint-id membership flags
    * ([[Mutations.setEdgePropsWhere]] / [[Mutations.deleteEdgesWhere]])
    * instead of match → eid set → eid re-join (two extra edge-table passes).
    * Semantically identical because a physical edge matches such a pattern
    * at most once and its endpoints are functionally determined. Returns
    * None whenever the shape doesn't apply — the generic eid path runs.
    */
  private def pushdownEdgeMutations(g: PropertyGraph, readPrefix: Seq[Clause],
      actions: Seq[Clause]): Option[(PropertyGraph, DataFrame)] = {
    val (head, relPat, tail, where) = readPrefix match {
      case Seq(MatchClause(Seq(PathPat(h, Seq((r, d)), None, None, false)), w, false)) =>
        (h, r, d, w)
      case _ => return None
    }
    if (relPat.range.nonEmpty) return None
    // single action only: bindings are fixed against the INPUT snapshot, but
    // this path re-derives the hit set from predicates — a second action
    // after a SET that rewrote a predicate column would see the mutated
    // values (EdgeMutationSpec "parallel edges": SET r.weight=9 DELETE r
    // must still delete the matched edge). One action can't race itself.
    if (actions.size != 1) return None
    // orient the pattern onto the edge table's (src, dst); undirected and
    // self-loop patterns keep the generic path (a Both-edge can match in
    // either orientation; a self-loop adds a src=dst constraint)
    val (srcPat, dstPat) = relPat.dir match {
      case graft.graph.Out => (head, tail)
      case graft.graph.In  => (tail, head)
      case _               => return None
    }
    if (srcPat.v.isDefined && srcPat.v == dstPat.v) return None
    val rv = relPat.v.getOrElse(return None)
    val relType = relPat.relTypes match {
      case Seq(t) => Some(t)
      case Seq()  => None
      case _      => return None // type alternation → generic path
    }
    // a rel var bound by the prefix and mutated more than once per clause
    // list is fine; a rel var REUSED as a node var, or node vars referenced
    // by the mutations, is not — checked structurally below.
    try {
      // route each WHERE conjunct to the single entity it references
      var srcPreds = Vector.empty[Column]
      var dstPreds = Vector.empty[Column]
      var edgePreds = Vector.empty[Column]
      for (c <- where.toSeq.flatMap(conjuncts)) refVars(c).toSeq match {
        case Seq() => edgePreds :+= toCol(c) // var-free: constant, edge side
        case Seq(v) if srcPat.v.contains(v) =>
          requireCols(c, g.nodes.columns); srcPreds :+= toCol(c)
        case Seq(v) if dstPat.v.contains(v) =>
          requireCols(c, g.nodes.columns); dstPreds :+= toCol(c)
        case Seq(v) if v == rv =>
          requireCols(c, g.edges.columns); edgePreds :+= toCol(c)
        case _                              => throw Unsupported // cross-entity
      }
      // endpoint membership sets: label conjunction + inline props + WHERE
      def nodeSet(p: Ast.NodePat, preds: Seq[Column]): Option[DataFrame] = {
        val labelPreds = (p.label.toSeq ++ p.extraLabels)
          .map(l => array_contains(col("labels"), l))
        val inline = p.props.map { case (k, v) =>
          if (!g.nodes.columns.contains(k)) throw Unsupported
          // like the WHERE-conjunct routing above, the VALUE may only
          // reference this endpoint's own variable — a cross-variable inline
          // prop ({y: a.x} on the other endpoint) would compile a.x as a
          // column of THIS node table; fall back to the generic eid path
          if (!refVars(v).subsetOf(p.v.toSet)) throw Unsupported
          requireCols(v, g.nodes.columns)
          col(k) === toCol(v)
        }
        val all = labelPreds ++ inline ++ preds
        if (all.isEmpty) None // unconstrained endpoint: store invariant holds
        else Some(all.foldLeft(g.nodes)((df, c) => df.filter(c)).select(col("id")))
      }
      val srcSet = nodeSet(srcPat, srcPreds)
      val dstSet = nodeSet(dstPat, dstPreds)
      val edgePred = edgePreds.reduceOption(_ && _)

      val out = actions.foldLeft(g) { (acc, a) =>
        a match {
          case SetClause(items) =>
            val props = items.map {
              case SetProp(Expr.Prop(`rv`, k), value)
                  if refVars(value).subsetOf(Set(rv)) =>
                // key columns (src/dst/rel) rewrite the edge's identity:
                // matchedEdgeKeys below only records the PRE-mutation keys,
                // so the tracked write set would miss the renamed edge —
                // generic path + diff fallback instead
                if (k == "src" || k == "dst" || k == "rel" || k == "eid")
                  throw Unsupported
                // the written key may be dynamic (routes to the props map),
                // but every key the VALUE reads must be a typed edge column
                requireCols(value, g.edges.columns)
                k -> toCol(value)
              case _ => throw Unsupported
            }
            Mutations.setEdgePropsWhere(acc, relType, srcSet, dstSet, edgePred, props)
          case DeleteClause(Seq(`rv`), _) =>
            Mutations.deleteEdgesWhere(acc, relType, srcSet, dstSet, edgePred)
          case _ => throw Unsupported // REMOVE etc. → generic eid path
        }
      }
      // the hit set doubles as the tracked OCC write set (same flags)
      Some((out, Mutations.matchedEdgeKeys(g, relType, srcSet, dstSet, edgePred)))
    } catch { case Unsupported => None }
  }

  /** Expression → Column in node-table context (SET values may reference the
    * node's own properties).
    */
  private def nodeExpr(e: Expr.E): Column = e match {
    case Expr.Lit(v)     => lit(v)
    case Expr.Prop(_, k) => col(k)
    case Expr.Var(_)     => col("id")
    case Expr.Bin(op, l, r) =>
      val (cl, cr) = (nodeExpr(l), nodeExpr(r))
      op match {
        case "+" => cl + cr
        case "-" => cl - cr
        case "*" => cl * cr
        case "/" => cl / cr
        case "%" => cl % cr
        case other => throw new IllegalArgumentException(s"SET operator $other")
      }
    case Expr.Func(n, args, _) => n.toLowerCase match {
      case "toupper" | "upper" => upper(nodeExpr(args.head))
      case "tolower" | "lower" => lower(nodeExpr(args.head))
      case "coalesce" => coalesce(args.map(nodeExpr): _*)
      case other => throw new IllegalArgumentException(s"SET function $other()")
    }
    case other => throw new IllegalArgumentException(s"unsupported SET expression $other")
  }

  private def litValue(e: Expr.E): Any = e match {
    case Expr.Lit(v) => v
    case other => throw new IllegalArgumentException(s"expected literal, got $other")
  }

  /** Literal, or constant-folded via the SHARED [[Compiler.constFold]]
    * (the same folding GraftSession's typed unique probe uses, so the
    * value a probe validated is always the value the mutation writes).
    * Row-dependent or unfoldable expressions throw litValue's message:
    * CREATE/MERGE property maps here are per-statement constants.
    */
  private def constValue(compiler: Compiler, e: Expr.E): Any =
    compiler.constFold(e).getOrElse(litValue(e))

  /** A variable bound by the MATCH prefix is a relationship when its binding
    * carries the synthesized edge-id column (the compiler prefixes every edge
    * column with `v__`). Routes SET/REMOVE/DELETE on it to the edge-table
    * mutations (reference set_edge_property / delete_edge, database.rs:945,931).
    */
  private def isEdgeVar(bindings: DataFrame, v: String): Boolean =
    bindings.columns.contains(s"${v}__eid")

  /** Apply an eid-keyed edge mutation. The graph threading through run()'s
    * mutation fold already carries the eid column assigned ONCE against the
    * pre-mutation state (the same ids the bindings were compiled against);
    * edges created mid-query ride along with a null eid, which no
    * binding-derived id can match. run() drops the column at the end.
    */
  private def edgeMutation(g: PropertyGraph)(
      f: PropertyGraph => PropertyGraph): PropertyGraph = {
    require(g.edges.columns.contains("eid"),
      "edge mutations must run inside run()'s eid-threaded fold")
    f(g)
  }

  private def apply(spark: SparkSession, compiler: Compiler, g: PropertyGraph, bindings: => DataFrame,
      clause: Clause): PropertyGraph = clause match {

    case CreateClause(path) if path.tail.isEmpty =>
      // standalone CREATE (n:Label {id: …, …}) — id is required (the
      // distributed engine does not invent ids; callers own the id space)
      val node = path.head
      val label = node.label.getOrElse(
        throw new IllegalArgumentException("CREATE needs a label"))
      val props = node.props.map { case (k, v) => k -> constValue(compiler, v) }.toMap
      require(props.contains("id"), "CREATE needs an explicit id property")
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val id = props("id") match {
        case l: Long => l
        case i: Int => i.toLong
        case other => throw new IllegalArgumentException(s"id must be integer, got $other")
      }
      var row = spark.createDataFrame(
        java.util.List.of(Row(id)),
        StructType(Seq(StructField("id", LongType))))
        .withColumn("labels", array((label +: node.extraLabels).map(lit): _*))
      for ((k, v) <- props if k != "id") row = row.withColumn(k, lit(v))
      Mutations.createNodes(g, row)

    case CreateClause(path) =>
      // CREATE (a)-[:T {…}]->(b) with a, b bound by the MATCH prefix
      require(path.tail.size == 1, "CREATE supports a single relationship")
      val (rel, dstPat) = path.tail.head
      val relType = rel.relTypes match {
        case Seq(t) => t
        case Seq()  => throw new IllegalArgumentException("CREATE relationship needs a type")
        case _      => throw new IllegalArgumentException("CREATE relationship takes exactly one type")
      }
      val (srcVar, dstVar) = (path.head.v.get, dstPat.v.get)
      val edges = bindings.select(col(srcVar).as("src"), col(dstVar).as("dst"))
        .distinct()
        .withColumn("rel", lit(relType))
      Mutations.createEdges(g, edges)

    case SetClause(items) =>
      // Edge-var items stay per-item (eid-keyed edge joins); all node items
      // targeting the same variable collapse into ONE flag join
      // (Mutations.setNodeFieldsByIds) instead of one join per item — the
      // per-item fold was the q_cypher_setmap latency hot spot (k SET items
      // = k full-node-table exchanges). Node items expand to an ordered
      // (prop, value) list; `n = {map}` (replace) expands against the node
      // schema AS OF that item (nulling every other property column), same
      // as the per-item fold it replaces. Node- and edge-table mutations
      // commute (disjoint tables), so grouping by target preserves order.
      val nodeItems = scala.collection.mutable.LinkedHashMap
        .empty[String, (Vector[(String, Column)], Vector[String])]
      var acc = g
      for (item <- items) item match {
        case SetProp(Expr.Prop(v, key), value) if isEdgeVar(bindings, v) =>
          acc = edgeMutation(acc)(Mutations.setEdgePropertyByIds(_,
            bindings.select(col(s"${v}__eid")), key, nodeExpr(value)))
        case SetProp(Expr.Prop(v, key), value) =>
          val (ps, ls) = nodeItems.getOrElse(v, (Vector.empty, Vector.empty))
          nodeItems(v) = (ps :+ (key -> nodeExpr(value)), ls)
        case SetAllProps(v, Expr.MapLit(kvs), merge) =>
          // n += {map} merges the given keys; n = {map} additionally nulls
          // every other property column (the typed-column stand-in for
          // "remove all other properties", ref ast.rs AllProperties)
          val given = kvs.toMap
          val targets: Seq[(String, Column)] =
            if (merge) kvs.map { case (k, e) => k -> nodeExpr(e) }
            else {
              val propCols = acc.nodes.columns.filterNot(c =>
                c == "id" || c == "labels").toSeq
              propCols.map(k => k -> given.get(k).map(nodeExpr)
                .getOrElse(lit(null)))
            }
          val (ps, ls) = nodeItems.getOrElse(v, (Vector.empty, Vector.empty))
          nodeItems(v) = (ps ++ targets, ls)
        case SetLabel(v, labels) =>
          val (ps, ls) = nodeItems.getOrElse(v, (Vector.empty, Vector.empty))
          nodeItems(v) = (ps, ls ++ labels)
        case other =>
          throw new IllegalArgumentException(s"unsupported SET item $other")
      }
      nodeItems.foldLeft(acc) { case (a, (v, (props, labels))) =>
        Mutations.setNodeFieldsByIds(a, bindings.select(col(v)), props, labels)
      }

    case DeleteClause(vars, detach) =>
      vars.foldLeft(g)((acc, v) =>
        if (isEdgeVar(bindings, v))
          edgeMutation(acc)(Mutations.deleteEdgesByIds(_,
            bindings.select(col(s"${v}__eid"))))
        else Mutations.deleteNodesByIds(acc, bindings.select(col(v)), detach))

    case RemoveClause(v, label) =>
      Mutations.removeLabelByIds(g, bindings.select(col(v)), label)

    case RemovePropClause(v, prop) if isEdgeVar(bindings, v) =>
      edgeMutation(g)(Mutations.removeEdgePropertyByIds(_,
        bindings.select(col(s"${v}__eid")), prop))

    case RemovePropClause(v, prop) =>
      Mutations.removeNodePropertyByIds(g, bindings.select(col(v)), prop)

    case MergeClause(node, onCreate, onMatch) =>
      val label = node.label.getOrElse(
        throw new IllegalArgumentException("MERGE needs a label"))
      val props = node.props.map { case (k, v) => k -> constValue(compiler, v) }
      require(props.nonEmpty, "MERGE needs at least one property")
      val keyCol = props.head._1
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      require(props.exists(_._1 == "id"), "MERGE needs an id property for the create path")
      val id = props.find(_._1 == "id").get._2 match {
        case l: Long => l
        case i: Int => i.toLong
        case other => throw new IllegalArgumentException(s"id must be integer, got $other")
      }
      var incoming = spark.createDataFrame(
        java.util.List.of(Row(id)),
        StructType(Seq(StructField("id", LongType))))
        .withColumn("labels", array((label +: node.extraLabels).map(lit): _*))
      for ((k, v) <- props if k != "id") incoming = incoming.withColumn(k, lit(v))
      Mutations.mergeNodes(g, incoming, keyCol,
        onMatchSet = onMatch.map { case (p2, v) => p2.key -> nodeExpr(v) }.toMap,
        onCreateSet = onCreate.map { case (p2, v) => p2.key -> nodeExpr(v) }.toMap)

    case other => throw new IllegalArgumentException(s"not a mutation clause: $other")
  }
}
