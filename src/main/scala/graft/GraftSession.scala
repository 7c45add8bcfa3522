package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.compiler.Compiler
import graft.frontends.cypher.CypherFrontend
import graft.graph.PropertyGraph

/** User-facing session over one property graph — the Spark-native analog of
  * the reference's `GrafeoDB` facade + `Session`
  * (crates/grafeo-engine/src/database.rs:327, src/session.rs:160).
  * Each query language front-end parses to the shared IR; the compiler
  * lowers IR to a DataFrame, and Catalyst takes it from there.
  */
final class GraftSession(val spark: SparkSession, val graph: PropertyGraph) {
  // queries compile against the edge-id-carrying view: openCypher
  // relationship-uniqueness and rel-var re-binding need edge identity
  // (reference assigns edge ids at load, graph/lpg/store.rs) — the eid
  // column prunes away whenever a plan doesn't use it
  private val compiler = new Compiler(spark, graph.withEdgeIds)

  /** Per-session LRU plan cache (reference QueryCache, query/cache.rs:1-60,
    * consulted at session.rs:160). Read-only entry points route through it;
    * mutations return new graphs (hence new sessions with fresh caches), so
    * entries never go stale.
    */
  private val planCache = graft.core.PlanCache.forSession(spark)

  /** (hits, misses) of this session's plan cache. */
  def planCacheStats: (Long, Long) = (planCache.hits, planCache.misses)

  /** openCypher entry point (reference Session::execute_cypher,
    * session.rs:290).
    */
  def cypher(query: String): DataFrame =
    planCache.get("cypher\u0000" + cycleSplitMode + "\u0000" + query) {
      compileCypher(() => CypherFrontend.translateText(query))
    }

  // the cycle-split conf changes the compiled plan shape (off | auto |
  // true), so it must be part of the cache key — otherwise a mid-session
  // flag flip would keep serving the stale shape for already-seen strings
  private def cycleSplitMode: String =
    spark.conf.getOption("spark.graft.cypher.cycleSplit").getOrElse("")

  /** `spark.graft.cypher.cycleSplit` handling: under `auto` — and, since
    * round 15, when the conf is UNSET — translate once as a probe (no
    * split; qualifying cyclic patterns leave advisor notes), consult the
    * advisor's fanout cost model against THIS session's graph, and only
    * when the 4x margin holds re-translate with the split forced on.
    * `true` flows through unchanged (frontend always splits); any other
    * value (`off`/`false`) disables the advisor.
    *
    * Why auto is the default now: the reference never auto-selects its
    * leapfrog operator (planner.rs:2165-2170) because its planner has no
    * cost model for it — graft DOES (CycleAdvisor, per-pattern 4x-margin
    * fanout estimates), and the decision is hash-pinned result-identical
    * at sf0.01/0.1/1 (CycleSplitSpec) with a row-identical sf10 probe,
    * while the measured win grows with scale (5.4x at sf1, 11.5x at
    * sf10, scale/SCALE_GATE.md). Letting collected statistics pick the
    * join shape is the same stance Catalyst takes with join reordering —
    * the Spark-first default is the cost model, not the fixed shape.
    */
  private def compileCypher(translate: () => graft.ir.Op.T): DataFrame = {
    val op = translate()
    val mode = spark.conf.getOption("spark.graft.cypher.cycleSplit")
    val auto = mode.contains("auto") || mode.isEmpty
    val wins = if (auto)
      graft.frontends.cypher.CycleAdvisor.autoDecide(graph.nodes, graph.edges)
    else Set.empty[Int]
    // wins = the hop counts whose own margin cleared: the re-translation
    // splits exactly those patterns (a sub-margin cycle in the same query
    // keeps its chain plan)
    if (wins.nonEmpty)
      compiler.compile(graft.frontends.cypher.CycleAdvisor.withForced(wins)(translate()))
    else compiler.compile(op)
  }

  /** Parameterized openCypher: `$name` placeholders bind to `params` at
    * translate time (reference processor.rs:417-600), so Catalyst receives
    * plain literals — filter pushdown and constant folding apply as if the
    * values were inlined. Cached per (query, bound values): the reference
    * likewise caches the parsed AST and re-substitutes per call, so distinct
    * bindings are distinct optimized plans.
    */
  def cypher(query: String, params: Map[String, Any]): DataFrame = {
    val key = "cypher\u0000" + cycleSplitMode + "\u0000" + query + "\u0000" +
      params.toSeq.sortBy(_._1).map { case (k, v) =>
        val vs = String.valueOf(v)
        val cls = if (v == null) "null" else v.getClass.getName
        s"${k.length}:$k=$cls:${vs.length}:$vs"
      }.mkString("\u0001")
    planCache.get(key) {
      compileCypher(() => CypherFrontend.bindParams(
        CypherFrontend.translateText(query), params))
    }
  }

  /** GQL entry point (reference GrafeoDB::execute, database.rs:327). The ISO
    * GQL core pattern surface shares the openCypher grammar and IR; the
    * GQL-specific statements (INSERT, CREATE VECTOR INDEX — reference
    * gql_translator.rs, gql/ast.rs:386) route through
    * graft.frontends.gql.GqlFrontend. DDL/DML here returns a summary or
    * throws toward the stateful entry points ([[gqlUpdate]],
    * [[createVectorIndex]]) — reads compile to a DataFrame as usual.
    */
  def gql(query: String): DataFrame =
    graft.frontends.gql.GqlFrontend.parseStatement(query) match {
      case graft.frontends.gql.GqlQuery(op) =>
        planCache.get("gql " + query)(compiler.compile(op))
      case _: graft.frontends.gql.GqlMutation =>
        throw new IllegalArgumentException(
          "INSERT/SET/DELETE run through gqlUpdate(), which returns the mutated graph")
      case _: graft.frontends.gql.GqlCreateVectorIndex =>
        throw new IllegalArgumentException(
          "CREATE VECTOR INDEX runs through createVectorIndex(query, vectors, idCol)")
      case graft.frontends.gql.GqlCreateGraph(name, like) =>
        createGraph(name, like)
      case stmt: graft.frontends.gql.GqlCreateType =>
        createType(stmt)
    }

  /** Parameterized GQL (same binding path as [[cypher]]). */
  def gql(query: String, params: Map[String, Any]): DataFrame =
    cypher(query, params)

  // Typed-schema catalog (reference gql/ast.rs:346 CreateNodeTypeStatement /
  // :357 CreateEdgeTypeStatement): declared types are introspectable via
  // [[schemaTypes]] and enforce NOT NULL property presence on INSERT/CREATE
  // of a typed label. The engine stays schema-flexible underneath — the
  // catalog constrains writes, it does not change storage (the reference's
  // LPG store is likewise schema-flexible with typed-schema validation).
  private val typeCatalog = scala.collection.concurrent.TrieMap
    .empty[(String, String), Seq[graft.frontends.gql.GqlPropertyDef]]

  private def createType(stmt: graft.frontends.gql.GqlCreateType): DataFrame = {
    require(!typeCatalog.contains((stmt.kind, stmt.name)),
      s"${stmt.kind} type '${stmt.name}' already exists")
    typeCatalog((stmt.kind, stmt.name)) = stmt.props
    import spark.implicits._
    Seq((stmt.kind, stmt.name, stmt.props.size.toLong))
      .toDF("kind", "name", "n_props")
  }

  /** Declared schema types, one row per property (reference
    * SchemaInfo node/edge types).
    */
  def schemaTypes: DataFrame = {
    import spark.implicits._
    typeCatalog.toSeq.flatMap { case ((kind, name), props) =>
      props.map(p => (kind, name, p.name, p.dataType, p.nullable, p.unique))
    }.sortBy(t => (t._1, t._2, t._3))
      .toDF("kind", "name", "property", "data_type", "nullable", "is_unique")
  }

  /** NOT NULL + UNIQUE enforcement for typed labels on the write path
    * (reference catalog/mod.rs:210-243: add_required_property /
    * add_unique_constraint, checked per insert). NOT NULL is a static AST
    * check; UNIQUE probes the live graph through
    * [[graft.graph.Mutations.violatesUnique]] — a violating CREATE throws
    * before anything mutates, while MERGE keyed ON the unique property is
    * the sanctioned dedup form (match-or-create can't duplicate its own
    * key) and a MERGE on a different key is only probed when it would
    * actually take its create path.
    */
  private def validateTyped(query: String): Unit = {
    if (typeCatalog.isEmpty) return
    val q = graft.frontends.cypher.CypherFrontend.parse(query)

    // Literal, or constant-foldable (Compiler.constFold): `lower('A@X.COM')`,
    // `1 + 2` and any other row-independent expression evaluates to one
    // value, so unique probing works for computed constants too (a bare
    // literal-only probe regressed MERGE on a computed unique key: the
    // create-path default probed the OTHER unique props and collided with
    // the very node the merge would have matched). Row-dependent
    // expressions (vars, props, params, subqueries) stay None.
    def litOf(e: graft.ir.Expr.E): Option[Any] = compiler.constFold(e)
    // values this STATEMENT is about to create, per (label, prop): a
    // multi-clause statement (CREATE … CREATE …) must not insert the same
    // unique value twice even though each clause probes the pre-mutation
    // graph (each probe alone would pass)
    val inStatement = scala.collection.mutable.Set.empty[(String, String, Any)]
    def checkUnique(n: graft.frontends.cypher.Ast.NodePat, l: String,
        props: Seq[graft.frontends.gql.GqlPropertyDef],
        excludeKey: Option[String] = None): Unit =
      for (p <- props if p.unique && !excludeKey.contains(p.name);
           v <- n.props.collectFirst { case (k, e) if k == p.name => e }) {
        // UNIQUE enforcement is literal-valued: a non-literal expression
        // cannot be probed pre-mutation, and silently skipping it would
        // let the constraint be bypassed — reject loudly instead (the
        // reference's typed-schema DML takes literal property maps too)
        val value = litOf(v).getOrElse(throw new IllegalStateException(
          s"unique property '${p.name}' of type '$l' requires a literal " +
            "value: non-literal expressions cannot be constraint-checked"))
        if (!inStatement.add((l, p.name, value)) ||
            graft.graph.Mutations.violatesUnique(graph, l, p.name, Seq(value)))
          throw new IllegalStateException(
            s"unique constraint violation: a node of type '$l' with " +
              s"${p.name} = $value already exists")
      }

    q.clauses.foreach {
      case c: graft.frontends.cypher.Ast.CreateClause =>
        val nodes = c.path.head +: c.path.tail.map(_._2)
        for (n <- nodes; l <- n.label.toSeq ++ n.extraLabels;
             props <- typeCatalog.get(("node", l))) {
          for (p <- props if !p.nullable)
            require(n.props.exists(_._1 == p.name),
              s"node type '$l' requires property '${p.name}' (NOT NULL)")
          checkUnique(n, l, props)
        }
        for ((r, _) <- c.path.tail; t <- r.relTypes;
             props <- typeCatalog.get(("edge", t));
             p <- props if !p.nullable)
          require(false,
            s"edge type '$t' requires property '${p.name}' (NOT NULL); " +
              "relationship property maps are not supported in CREATE")
      case m: graft.frontends.cypher.Ast.MergeClause =>
        for (l <- m.node.label.toSeq ++ m.node.extraLabels;
             props <- typeCatalog.get(("node", l))) {
          val keyCol = m.node.props.headOption.map(_._1)
          val mergesOnUnique = keyCol.exists(k => props.exists(p => p.unique && p.name == k))
          // probe the create path only if the merge key has no match —
          // LABEL-BLIND like mergeNodes' own key anti-join, else a merge
          // that matches a differently-labeled node would be probed as
          // creating and spuriously rejected
          val keyValue = for (k <- keyCol;
              v <- m.node.props.collectFirst { case (`k`, e) => e };
              value <- litOf(v)) yield value
          // a VARIABLE merge key is row-dependent: match-vs-create is
          // undecidable pre-mutation, and probing under a create-path
          // assumption spuriously rejects the MATCH case against the very
          // node the merge would match — skip the probe, don't guess
          val keyDecidable = keyCol.isEmpty || keyValue.isDefined
          val wouldCreate = (for (k <- keyCol; value <- keyValue) yield
            !graft.graph.Mutations.existsByKey(graph, k, value))
            .getOrElse(true)
          // MERGE keyed ON a unique property cannot duplicate its own key
          // (match-or-create), but a SECOND unique property in the map can
          // still collide when the create path fires — exclude only the
          // merge key from the probe, never the whole check
          if (keyDecidable && wouldCreate)
            checkUnique(m.node, l, props,
              excludeKey = if (mergesOnUnique) keyCol else None)
        }
      case _ => ()
    }
  }

  /** GQL INSERT (and the shared SET/DELETE/MERGE surface) — functional
    * semantics like [[cypherUpdate]]: returns the mutated graph.
    */
  def gqlUpdate(query: String): PropertyGraph = {
    validateTyped(query)
    graft.frontends.cypher.CypherUpdates.run(spark, graph, query)
  }

  private val vectorIndexes =
    scala.collection.concurrent.TrieMap.empty[String, graft.frontends.gql.VectorIndexes.VectorIndex]

  /** `CREATE VECTOR INDEX name ON Label(prop) USING LSH|IVF [OPTIONS(…)]`
    * (reference gql/ast.rs:386): builds the LSH-bucket or IVF index over
    * `vectors` and registers it on this session; returns the one-row DDL
    * summary.
    */
  def createVectorIndex(query: String, vectors: DataFrame, idCol: String): DataFrame =
    graft.frontends.gql.GqlFrontend.parseStatement(query) match {
      case stmt: graft.frontends.gql.GqlCreateVectorIndex =>
        val idx = graft.frontends.gql.VectorIndexes.create(stmt, vectors, idCol)
        vectorIndexes(stmt.name) = idx
        idx.summary
      case _ => throw new IllegalArgumentException("not a CREATE VECTOR INDEX statement")
    }

  /** Look up an index registered by [[createVectorIndex]]. */
  def vectorIndex(name: String): Option[graft.frontends.gql.VectorIndexes.VectorIndex] =
    vectorIndexes.get(name)

  /** Register an externally built or [[graft.frontends.gql.VectorIndexes.load]]ed
    * index on this session (the reference reloads persisted indexes when
    * a database is opened; graft sessions opt in per index).
    */
  def registerVectorIndex(idx: graft.frontends.gql.VectorIndexes.VectorIndex): Unit =
    vectorIndexes(idx.name) = idx

  /** db.vector_search over a registered index (reference database.rs:1128;
    * a multi-row `queries` frame is the batch form, database.rs:1220).
    */
  def vectorSearch(indexName: String, queries: DataFrame, qIdCol: String,
      qVecCol: String, k: Int, minScore: Option[Double] = None,
      maxDist: Option[Double] = None): DataFrame =
    vectorIndexes.getOrElse(indexName,
        throw new IllegalArgumentException(s"unknown vector index '$indexName'"))
      .search(queries, qIdCol, qVecCol, k, minScore, maxDist)

  // GQL graph catalog (reference gql/ast.rs:7-540 catalog statements;
  // GrafeoDB holds many graphs, database.rs): named graphs registered on
  // this session. CREATE GRAPH registers an empty graph with this (or the
  // LIKE-source's) typed schema — extensional contents arrive via
  // sessionFor(name).gqlUpdate(INSERT …).
  private val graphCatalog =
    scala.collection.concurrent.TrieMap.empty[String, PropertyGraph]

  private def createGraph(name: String, like: Option[String]): DataFrame = {
    require(!graphCatalog.contains(name), s"graph '$name' already exists")
    val template = like.map(l => graphCatalog.getOrElse(l,
      throw new IllegalArgumentException(s"LIKE graph '$l' does not exist")))
      .getOrElse(graph)
    graphCatalog(name) = PropertyGraph(
      template.nodes.limit(0), template.edges.limit(0))
    import spark.implicits._
    Seq((name, "created")).toDF("graph_name", "status")
  }

  /** The named graph registered by `CREATE GRAPH`, if any. */
  def graphNamed(name: String): Option[PropertyGraph] = graphCatalog.get(name)

  /** A session over a cataloged graph (shares this session's Spark session;
    * plan caches are per-session so entries never cross graphs).
    */
  def sessionFor(name: String): GraftSession =
    new GraftSession(spark, graphCatalog.getOrElse(name,
      throw new IllegalArgumentException(s"unknown graph '$name'")))

  /** Replace a cataloged graph's contents (the functional-mutation
    * counterpart for cataloged graphs).
    */
  def updateGraph(name: String, g: PropertyGraph): Unit = {
    require(graphCatalog.contains(name), s"unknown graph '$name'")
    graphCatalog(name) = g
  }

  /** Cypher update queries (CREATE/SET/DELETE/DETACH DELETE/MERGE/REMOVE
    * after an optional MATCH prefix) — returns the mutated graph (functional
    * semantics; reads in the same query see the input snapshot, matching the
    * reference's MVCC view).
    */
  def cypherUpdate(query: String): graft.graph.PropertyGraph =
    graft.frontends.cypher.CypherUpdates.run(spark, graph, query)

  /** Commit this session's graph as the next epoch of the versioned
    * snapshot store at `path` (MVCC commit, reference mvcc.rs /
    * transaction/manager.rs). Returns the epoch number.
    */
  def commitEpoch(path: String): Long =
    graft.sources.GraphIO.Epochs.commit(graph, path)

  /** Commit this session's graph as a DELTA epoch when a base exists
    * (O(changed rows) commit I/O; bounding full snapshot every
    * `fullEvery` epochs) — the LPG side of the table-format log model.
    */
  def commitEpochIncremental(path: String, fullEvery: Int = 10): Long =
    graft.sources.GraphIO.Epochs.commitIncremental(graph, path, fullEvery)

  /** First column of the first result row — the scalar-convenience
    * entry point (reference database.rs:479 `query_scalar`; routes
    * through the default GQL/Cypher `execute` path like the reference).
    */
  def queryScalar(query: String): Any = gql(query).head().get(0)

  /** Algorithms facade over this session's graph (reference
    * `db.algorithms()`, docs/algorithms/index.md:78).
    */
  def algorithms: graft.algos.GraphAlgorithms =
    new graft.algos.GraphAlgorithms(spark, graph)

  /** `DatabaseStats` as one row per metric (reference database.rs:1318
    * `detailed_stats`; shape admin.rs:51).
    */
  def stats: DataFrame = graft.graph.Admin.stats(graph)

  /** LPG schema introspection: `(kind: label|edge_type, name, count)`
    * rows (reference database.rs:1365 `schema`; admin.rs:72-98).
    */
  def schemaInfo: DataFrame = graft.graph.Admin.schemaInfo(graph)

  /** Referential-integrity audit: `(kind, code, n)` rows — dangling
    * edge endpoints as counts (reference database.rs:1432 `validate`).
    */
  def validate: DataFrame = graft.graph.Admin.validate(graph)

  /** Build a sorted-projection index over a node property (reference
    * database.rs:998 `create_property_index`); [[findNodesByProperty]]
    * lookups on `prop` then prune to O(matches) row groups.
    */
  def createPropertyIndex(prop: String, dir: String): Unit =
    graft.graph.PropertyIndexes.create(graph, prop, dir)

  /** database.rs:1245 `drop_property_index`. */
  def dropPropertyIndex(prop: String): Boolean =
    graft.graph.PropertyIndexes.drop(graph, prop)

  /** database.rs:1251 `has_property_index`. */
  def hasPropertyIndex(prop: String): Boolean =
    graft.graph.PropertyIndexes.has(graph, prop)

  /** Node ids with `prop = value` — via the index when one exists, full
    * scan fallback otherwise (reference database.rs:1270).
    */
  def findNodesByProperty(prop: String, value: Any): DataFrame =
    graft.graph.PropertyIndexes.findNodesByProperty(graph, prop, value)

  /** Begin a transaction (reference Session::begin_transaction,
    * transaction/manager.rs): mutations stage on a private snapshot —
    * reads INSIDE the transaction see them, this session never does.
    * Commit hands back the staged graph (optionally publishing an epoch);
    * rollback rewinds to the begin snapshot. Snapshot isolation falls out
    * of the functional mutation model: the base graph is immutable, so
    * there is nothing to lock and nothing to undo.
    */
  def beginTransaction(): GraftTransaction = new GraftTransaction(spark, graph)

  /** Begin a transaction against an epoch STORE: the base snapshot is the
    * newest committed epoch, and [[GraftTransaction.commitEpochChecked]]
    * validates against any epoch published after it (optimistic concurrency,
    * reference transaction/manager.rs:208).
    */
  def beginTransaction(path: String): GraftTransaction = {
    val head = graft.sources.GraphIO.Epochs.list(spark, path).lastOption.getOrElse(
      throw new IllegalStateException(s"no committed epoch at $path"))
    new GraftTransaction(spark,
      graft.sources.GraphIO.Epochs.asOf(spark, path, head), Some((path, head)))
  }

  /** Snapshot-isolation session over a committed epoch (MVCC as-of read,
    * reference mvcc.rs:16-75).
    */
  def asOf(path: String, epoch: Long): GraftSession =
    new GraftSession(spark, graft.sources.GraphIO.Epochs.asOf(spark, path, epoch))

  /** Gremlin entry point (reference processor.rs:282-291). */
  def gremlin(query: String): DataFrame = planCache.get("gremlin " + query) {
    compiler.compile(graft.frontends.gremlin.GremlinFrontend.translate(query))
  }

  /** Gremlin mutation traversals (addV/addE/property/drop, reference
    * gremlin/ast.rs) — functional semantics: returns the mutated graph.
    */
  def gremlinUpdate(query: String): PropertyGraph =
    graft.frontends.gremlin.GremlinUpdates.run(spark, graph, query)

  /** GraphQL entry point (reference graphql_translator.rs). */
  def graphql(query: String): DataFrame = {
    if (query.trim.toLowerCase.startsWith("mutation"))
      throw new IllegalArgumentException(
        "mutation documents run through graphqlMutation(), which returns the mutated graph")
    planCache.get("graphql " + query) {
      compiler.compile(graft.frontends.graphql.GraphQLFrontend.translate(query))
    }
  }

  /** GraphQL mutations (reference graphql_translator.rs:130) — functional
    * semantics: returns the mutated graph.
    */
  def graphqlMutation(query: String): graft.graph.PropertyGraph =
    graft.frontends.graphql.GraphQLMutations.run(spark, graph, query)
}

/** A staged mutation scope over one begin-snapshot (reference
  * TransactionManager, transaction/manager.rs; MVCC view mvcc.rs:16-75).
  * Reads route through a session over the CURRENT staged graph; updates
  * replace it. Nothing is visible outside until the caller takes
  * [[commit]]'s graph (or publishes it via [[commitEpoch]]).
  */
final class GraftTransaction private[graft] (spark: SparkSession,
    base: PropertyGraph, epochBase: Option[(String, Long)] = None) {
  private var staged: PropertyGraph = base
  private var closed = false
  private var readNodeSets = List.empty[org.apache.spark.sql.DataFrame]
  private var readEdgeSets = List.empty[org.apache.spark.sql.DataFrame]
  // incremental write-set tracking (reference record_write): each staged
  // update contributes its touched keys; one untrackable update (MERGE)
  // poisons the whole set and commitEpochChecked falls back to the diff
  private var writeNodeSets = List.empty[org.apache.spark.sql.DataFrame]
  private var writeEdgeSets = List.empty[org.apache.spark.sql.DataFrame]
  private var writeSetTracked = true

  private def open(): Unit =
    require(!closed, "transaction already committed or rolled back")

  /** Read inside the transaction — sees staged mutations. */
  def cypher(query: String): DataFrame = {
    open()
    new GraftSession(spark, staged).cypher(query)
  }

  /** Stage a Cypher mutation (visible only to this transaction). Edge ids
    * assigned for relationship-variable bindings stay on the staged edges
    * between updates (`keepEids`), so a transaction chaining k edge
    * mutations runs the id-assignment window ONCE, not k times — edge
    * identity is stable for the transaction's lifetime, like the
    * reference's load-time ids. [[commit]] seals the graph eid-free.
    */
  def cypherUpdate(query: String): Unit = {
    open()
    val (out, touched) = graft.frontends.cypher.CypherUpdates.runTracked(
      spark, staged, query, keepEids = true)
    staged = out
    touched match {
      case Some((n, e)) => writeNodeSets ::= n; writeEdgeSets ::= e
      case None         => writeSetTracked = false
    }
  }

  // the synthesized eid column never leaves the transaction scope
  private def seal(g: PropertyGraph): PropertyGraph =
    if (g.edges.columns.contains("eid")) g.copy(edges = g.edges.drop("eid"))
    else g

  /** The staged graph as of now (still uncommitted). */
  def graph: PropertyGraph = seal(staged)

  /** Commit: closes the transaction, returns the final graph. */
  def commit(): PropertyGraph = {
    open()
    closed = true
    seal(staged)
  }

  /** Commit AND publish as the next epoch at `path` (durable MVCC commit). */
  def commitEpoch(path: String): Long = {
    val g = commit()
    graft.sources.GraphIO.Epochs.commit(g, path)
  }

  /** Record entity reads for serializable (SSI) validation — explicit, like
    * the reference's `record_read` (transaction/manager.rs:190). `nodeIds`:
    * a single node-id column; `edgeKeys`: (src, dst, rel).
    */
  def recordRead(nodeIds: org.apache.spark.sql.DataFrame = null,
      edgeKeys: org.apache.spark.sql.DataFrame = null): Unit = {
    open()
    Option(nodeIds).foreach(df => readNodeSets ::= df)
    Option(edgeKeys).foreach(df => readEdgeSets ::= df)
  }

  /** Commit with optimistic conflict detection against epochs published
    * after this transaction began (requires `beginTransaction(path)`).
    * Write-write conflicts abort at every isolation level; read-write
    * conflicts additionally abort at [[graft.tx.OptimisticTx.Serializable]].
    * On conflict the transaction stays open so the caller can inspect;
    * retry by beginning a fresh transaction from the new head.
    */
  def commitEpochChecked(
      isolation: graft.tx.OptimisticTx.Isolation = graft.tx.OptimisticTx.Snapshot): Long = {
    open()
    val (path, baseEpoch) = epochBase.getOrElse(throw new IllegalStateException(
      "commitEpochChecked needs a transaction begun with beginTransaction(path)"))
    val epoch = graft.tx.OptimisticTx.commitChecked(spark, path, baseEpoch,
      base, seal(staged), isolation,
      readNodes = readNodeSets.reduceOption(_ unionByName _),
      readEdges = readEdgeSets.reduceOption(_ unionByName _),
      trackedWriteSet =
        if (writeSetTracked && (writeNodeSets.nonEmpty || writeEdgeSets.nonEmpty))
          Some((writeNodeSets.reduce(_ unionByName _),
            writeEdgeSets.reduce(_ unionByName _)))
        else None)
    closed = true
    epoch
  }

  /** Rollback: closes the transaction, discarding staged mutations. */
  def rollback(): Unit = {
    open()
    staged = base
    closed = true
  }
}
