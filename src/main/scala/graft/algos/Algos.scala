package graft.algos

import org.apache.spark.graphx.{Edge, Graph, VertexId}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{LocalGraph, PropertyGraph}

/** Graph algorithms (SURVEY §2.6; reference
  * crates/grafeo-adapters/src/plugins/algorithms/) over the property graph —
  * GraphX/Pregel for the iterative ones, plain DataFrame loops where a
  * deterministic, oracle-checkable fixed-iteration form is wanted.
  *
  * Scale notes: GraphX partitions edges across the cluster (Pregel is the
  * reference's morsel loop, distributed); the DataFrame variants persist each
  * iteration's state and never materialize on the driver.
  */
object Algos {

  /** PropertyGraph → GraphX graph (vertex attr = 1.0, edge attr = weight). */
  def toGraphX(g: PropertyGraph): Graph[Double, Double] = {
    val vertices = g.nodes.select(col("id")).rdd
      .map(r => (r.getLong(0): VertexId, 1.0))
    val edges = g.edges.select(col("src"), col("dst"),
        coalesce(col("weight"), lit(1.0)).cast("double")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    Graph(vertices, edges)
  }

  /** PageRank, GraphX built-in (reference centrality.rs:135). */
  def pageRankX(spark: SparkSession, g: PropertyGraph, iters: Int,
      resetProb: Double = 0.15): DataFrame = {
    import spark.implicits._
    toGraphX(g).staticPageRank(iters, resetProb)
      .vertices.map { case (id, r) => (id, r) }.toDF("id", "rank")
  }

  /** PageRank as a deterministic fixed-iteration DataFrame loop —
    * r_{t+1}(v) = reset + damping · Σ_{u→v} r_t(u)/outdeg(u) — the form the
    * DuckDB oracle mirrors with an unrolled CTE chain. Out-degrees are
    * computed once and re-joined per iteration (one shuffle per iteration,
    * the minimum for topology-changing aggregation).
    */
  def pageRankDF(g: PropertyGraph, iters: Int, damping: Double = 0.85): DataFrame = {
    val spark = g.nodes.sparkSession
    val nodes = g.nodes.select(col("id")).distinct().persist()
    val edges0 = g.edges.select(col("src"), col("dst")).persist()
    // Adaptive strategy: a broadcast-sized graph runs all iterations in one
    // job with the identical synchronous recursion (LocalGraph.pageRank);
    // the per-iteration join loop below is the at-scale path.
    val maxE = LocalGraph.maxEdges(spark)
    // probe-and-collect in one job per frame (collectIfAtMost): the former
    // atMost + collect pair cost two scheduler round-trips per frame
    val eOpt = LocalGraph.collectIfAtMost(edges0, maxE)
    val nOpt = if (eOpt.isDefined) LocalGraph.collectIfAtMost(nodes, maxE) else None
    if (eOpt.isDefined && nOpt.isDefined) {
      val nArr = nOpt.get.map(_.getLong(0))
      val eArr = eOpt.get.map(r => (r.getLong(0), r.getLong(1)))
      Seq(nodes, edges0).foreach(_.unpersist(blocking = false))
      return LocalGraph.pageRank(spark, nArr, eArr, iters, damping)
    }
    // out-degree is loop-invariant: join it into the edge list ONCE instead of
    // once per iteration (one fewer shuffle per iteration)
    val edges = edges0
    val degEdges = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .persist()
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      // aggregate contributions BEFORE touching the nodes table: the groupBy
      // runs on the (smaller) contribution stream, the dangling-node fill-in
      // is a cheap left join afterwards
      val sums = degEdges
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("rank") / col("d")).as("c"))
        .groupBy("id")
        .agg(sum(col("c")).as("s"))
      ranks = nodes.join(sums, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
        .localCheckpoint() // truncate lineage: plan depth stays O(1) per iteration
    }
    // ranks is checkpoint-materialized; release the loop-invariant caches
    Seq(nodes, edges0, degEdges).foreach(_.unpersist(blocking = false))
    ranks
  }

  /** Eigenvector centrality (reference docs/algorithms/centrality.md:80 —
    * documented `algs.eigenvector_centrality()` API; the reference's native
    * centrality.rs does not implement it, its NetworkX adapter serves it).
    * `iters` unnormalized power-iteration steps x_{t+1} = A·x_t over the
    * undirected simple adjacency from x_0 = 1, then ONE final L2
    * normalization. The accumulator stays an exact integer (a sum of
    * neighbor counts bounded by maxDeg^iters · n, far under 2^53), so the
    * distributed sum order cannot perturb a single bit and the DuckDB
    * oracle's unrolled CTE chain matches hash-exactly — the same
    * determinism trick as q_pagerank, strengthened from rounding to
    * exactness. One join + one aggregate per iteration.
    */
  def eigenvectorCentrality(g: PropertyGraph, iters: Int = 4): DataFrame = {
    val spark = g.nodes.sparkSession
    val nodes = g.nodes.select(col("id")).distinct().persist()
    val adj = LinkPrediction.undirectedAdj(g).persist()
    // Integer exactness is the whole design: x_{t+1} = A·x_t over longs, so
    // x_t ≤ dmax^t. Anything past 2^63 would WRAP SILENTLY and the final
    // normalize would launder the garbage into plausible-looking doubles.
    // The local branch guards for free with Math.addExact; the distributed
    // branch pre-checks dmax^iters (one cheap aggregate, amortized over the
    // `iters` jobs that follow) and refuses loudly like the bounded-kernel
    // gates. dmax ≤ 1 (edgeless / matching) can never overflow.
    def checkDmaxBound(): Unit = {
      val dmax = adj.groupBy("node").agg(count(lit(1)).as("d"))
        .agg(coalesce(max(col("d")), lit(0L))).head.getLong(0)
      if (dmax > 1 && iters * math.log(dmax.toDouble) > 62 * math.log(2.0)) {
        // release the entry persists before refusing — a caller that
        // catches and retries with lower iters must not accumulate
        // orphaned cached blocks per attempt
        Seq(nodes, adj).foreach(_.unpersist(blocking = false))
        throw new IllegalArgumentException(
          s"eigenvectorCentrality: dmax=$dmax over $iters iterations exceeds " +
            "exact-integer range (dmax^iters > 2^62); reduce iters")
      }
    }
    // Adaptive strategy (same gate as pageRankDF): a broadcast-sized graph
    // runs every iteration in one job with the identical integer recursion.
    val maxE = LocalGraph.maxEdges(spark)
    val aOpt = LocalGraph.collectIfAtMost(adj, maxE)
    val nOpt = if (aOpt.isDefined) LocalGraph.collectIfAtMost(nodes, maxE) else None
    if (aOpt.isDefined && nOpt.isDefined) {
      import spark.implicits._
      val nArr = nOpt.get.map(_.getLong(0))
      val aArr = aOpt.get.map(r => (r.getLong(0), r.getLong(1)))
      Seq(nodes, adj).foreach(_.unpersist(blocking = false))
      val dmax = aArr.groupBy(_._1).valuesIterator
        .foldLeft(0L)((m, g) => math.max(m, g.size.toLong))
      if (dmax > 1 && iters * math.log(dmax.toDouble) > 62 * math.log(2.0))
        throw new IllegalArgumentException(
          s"eigenvectorCentrality: dmax=$dmax over $iters iterations exceeds " +
            "exact-integer range (dmax^iters > 2^62); reduce iters")
      // Dangling endpoints (edge ids absent from the node table — permitted,
      // see degreeCentrality) must not accumulate walk counts: the
      // distributed branch re-restricts x to node ids every iteration, so
      // the local loop only merges into KNOWN nodes, keeping both branches
      // bit-identical on the same graph regardless of the broadcast gate.
      val nSet = new java.util.HashSet[Long](nArr.length * 2)
      nArr.foreach(nSet.add)
      var xm = new java.util.HashMap[Long, Long]()
      nArr.foreach(xm.put(_, 1L))
      for (_ <- 1 to iters) {
        val next = new java.util.HashMap[Long, Long]()
        nArr.foreach(next.put(_, 0L))
        aArr.foreach { case (v, u) =>
          if (nSet.contains(v))
            next.merge(v, xm.getOrDefault(u, 0L),
              (a, b) => Math.addExact(a, b)) // belt-and-braces: never wraps
        }
        xm = next
      }
      val xs = nArr.map(v => xm.get(v).longValue())
      val n = math.max(math.sqrt(xs.map(x => x.toDouble * x).sum), 1.0)
      return nArr.zip(xs)
        // HALF_UP to match the distributed branch's round() (HALF_EVEN
        // rint would diverge from the oracle at exact half-boundaries)
        .map { case (v, x) => (v, BigDecimal(x / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .toSeq.toDF("id", "score")
    }
    checkDmaxBound()
    var x = nodes.withColumn("x", lit(1L))
    for (_ <- 1 to iters) {
      val sums = adj
        .join(x.select(col("id").as("nbr"), col("x")), "nbr")
        .groupBy(col("node").as("id"))
        .agg(sum(col("x")).as("s"))
      x = nodes.join(sums, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("s"), lit(0L)).as("x"))
        .localCheckpoint()
    }
    // Square in DOUBLES: x ≤ dmax^iters is long-exact, but x*x overflows
    // long once x > ~2^31 — well inside the dmax^iters ≤ 2^62 guard. The
    // local branch squares in doubles too, so both agree bit-for-bit.
    val norm = x.agg(
      sqrt(sum(col("x").cast("double") * col("x").cast("double"))).as("__n"))
    val out = x.crossJoin(norm) // 1-row broadcast
      .select(col("id"),
        round(col("x").cast("double") / greatest(col("__n"), lit(1.0)), 6)
          .as("score"))
    Seq(nodes, adj).foreach(_.unpersist(blocking = false))
    out
  }

  /** Connected components via GraphX (reference components.rs:95) —
    * small-star/large-star style label convergence; returns the minimum
    * vertex id per component (GraphX contract).
    */
  def connectedComponents(spark: SparkSession, g: PropertyGraph): DataFrame = {
    import spark.implicits._
    toGraphX(g).connectedComponents()
      .vertices.map { case (id, c) => (id, c) }.toDF("id", "component")
  }

  /** Triangle counts per vertex via GraphX (reference clustering.rs:130).
    * Adaptive strategy (same gate as the iterative loops): broadcast-sized
    * graphs count on the driver in one probe job — the GraphX pipeline
    * (RDD conversion + partitionBy + triangleCount) costs ~10 fixed stages
    * regardless of size. Integer counts, so the branches agree exactly.
    */
  def triangleCounts(spark: SparkSession, g: PropertyGraph): DataFrame = {
    import spark.implicits._
    localNodesEdges(spark, g) match {
      case Some((nArr, eArr)) =>
        return LocalGraph.triangleCounts(spark, nArr, eArr)
      case None =>
    }
    toGraphX(g).partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
      .triangleCount()
      .vertices.map { case (id, n) => (id, n.toLong) }.toDF("id", "triangles")
  }

  /** Probe-and-collect the (nodes, edges) pair under the broadcast gate —
    * `None` when either side exceeds it (the caller stays distributed).
    */
  private def localNodesEdges(spark: SparkSession, g: PropertyGraph)
      : Option[(Array[Long], Array[(Long, Long)])] = {
    val maxE = LocalGraph.maxEdges(spark)
    val eOpt = LocalGraph.collectIfAtMost(g.edges.select(col("src"), col("dst")), maxE)
    val nOpt =
      if (eOpt.isDefined) LocalGraph.collectIfAtMost(g.nodes.select(col("id")), maxE)
      else None
    for (e <- eOpt; n <- nOpt) yield
      (n.map(_.getLong(0)), e.map(r => (r.getLong(0), r.getLong(1))))
  }

  /** Local clustering coefficients (reference clustering.rs:162,199):
    * coeff(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) over the undirected simple
    * graph; nodes with fewer than two distinct neighbors score 0. Composes
    * the distributed triangle counts with distinct-neighbor degrees — two
    * aggregations plus one join, no new shuffle shape.
    */
  /** Distinct-neighbor degrees over the undirected simple view — the ONE
    * place the least/greatest+distinct dedup rule lives (shared by the
    * clustering metrics; LinkPrediction.undirectedAdj encodes the same
    * view as an adjacency).
    */
  private def undirectedDeg(g: PropertyGraph): DataFrame = {
    val ud = g.edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    ud.select(col("a").as("id")).unionByName(ud.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
  }

  def clusteringCoefficients(spark: SparkSession, g: PropertyGraph): DataFrame = {
    // Broadcast-sized graphs compute deg/tri/coeff on the driver in one
    // probe job (identical formula + Spark rounding, LocalGraph.round6);
    // the distributed composition below otherwise pays the GraphX triangle
    // pipeline plus two join shuffles.
    localNodesEdges(spark, g) match {
      case Some((nArr, eArr)) =>
        return LocalGraph.clusteringCoefficients(spark, nArr, eArr)
      case None =>
    }
    // start from g.nodes, not the edge endpoints: the facade contract is
    // one row per node INCLUDING isolated nodes (which score deg 0,
    // coeff 0 — like every other per-node frame)
    g.nodes.select(col("id")).distinct()
      .join(undirectedDeg(g), Seq("id"), "left_outer")
      .join(triangleCounts(spark, g), Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"),
        when(col("deg") >= 2,
          round(coalesce(col("triangles"), lit(0L)).cast("double") * 2 /
            (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)).as("coeff"))
  }

  /** Global clustering coefficient (reference clustering.rs:248):
    * 3·triangles / wedges = Σ_v tri(v) / Σ_v deg(v)·(deg(v)−1)/2 — one row.
    */
  def globalClustering(spark: SparkSession, g: PropertyGraph): DataFrame = {
    // broadcast-sized graphs: one probe job + driver sums (exact integers,
    // same rounding) instead of the GraphX pipeline + a join + an agg
    LocalGraph.collectIfAtMost(g.edges.select(col("src"), col("dst")),
        LocalGraph.maxEdges(spark)) match {
      case Some(rows) =>
        return LocalGraph.globalClustering(spark,
          rows.map(r => (r.getLong(0), r.getLong(1))))
      case None =>
    }
    // edge-derived is fine here: an isolated node contributes 0 triangles
    // and 0 wedges to the global sums either way
    undirectedDeg(g).join(triangleCounts(spark, g), Seq("id"), "left_outer")
      .agg(round(
        sum(coalesce(col("triangles"), lit(0L))).cast("double") /
          greatest(sum(col("deg") * (col("deg") - 1)).cast("double") / 2, lit(1.0)),
        6).as("global_coeff"))
  }

  /** DAG check (reference components.rs:352): acyclic iff there is no
    * self-loop and every strongly connected component is a singleton.
    * Built on the same SCC primitive as q_scc — Kahn peeling would take
    * O(longest path) synchronous rounds, pathological on chain graphs.
    *
    * At scale (past the broadcast threshold) the answer is screened by
    * iteration-bounded GraphX SCC and CONFIRMED by longest-path grading:
    * the confirm bound scales with the node count (a DAG's longest path is
    * < n, so within that bound non-convergence *proves* a cycle), capped at
    * [[isDagConfirmCap]] rounds. For the pathological case of a graph with
    * more than the cap's worth of nodes whose grading is still moving at
    * the cap — a legitimate DAG deeper than 8192 levels, or a cycle the
    * SCC screen under-merged — this method THROWS IllegalStateException
    * rather than guess; callers needing a total answer must catch it.
    */
  /** Hard cap on the isDag confirm pass's synchronous rounds (~65 ms/round
    * job floor → ~9 min worst case on an adversarial input).
    */
  val isDagConfirmCap: Int = 8192

  def isDag(spark: SparkSession, g: PropertyGraph, maxIters: Int = 20): Boolean = {
    val maxE = LocalGraph.maxEdges(spark)
    // Broadcast-sized fast path: probe-and-collect in one job per frame
    // (LocalGraph.collectIfAtMost), then EVERYTHING — self-loop screen,
    // iterative Tarjan, multi-node-component check — runs on the driver with
    // zero further Spark jobs. Two jobs total, down from six (self-loop
    // count, two atMost probes, two collects, one parallelize+shuffle to
    // re-aggregate the already-local component labels).
    LocalGraph.collectIfAtMost(g.edges.select(col("src"), col("dst")), maxE) match {
      case Some(eRows) =>
        val eArr = eRows.map(r => (r.getLong(0), r.getLong(1)))
        if (eArr.exists(e => e._1 == e._2)) return false
        LocalGraph.collectIfAtMost(g.nodes.select(col("id")).distinct(), maxE) match {
          case Some(nRows) =>
            val nArr = nRows.map(_.getLong(0))
            // broadcast-sized: iterative Tarjan is EXACT — singleton SCCs
            // really do prove acyclicity here
            val comp = LocalGraph.sccLocal(nArr, eArr)
            val sizes = new java.util.HashMap[Long, Int]()
            var multi = false
            nArr.foreach { id =>
              val c = comp.getOrDefault(id, id)
              val n = sizes.merge(c, 1, (a, b) => a + b)
              if (n > 1) multi = true
            }
            return !multi
          case None => () // node set over threshold: fall through
        }
      case None => () // edge set over threshold: fall through
    }
    if (g.edges.filter(col("src") === col("dst")).limit(1).count() > 0) return false
    // At scale, GraphX SCC is iteration-BOUNDED with no convergence
    // signal: an under-merged run labels a cycle's members as
    // singletons, so "no multi-node component" alone could answer
    // true on a cyclic graph. Use it only as the cheap cycle SCREEN
    // (a multi-node component is definitive), then CONFIRM the DAG
    // claim exactly: longest-path grading converges iff no reachable
    // cycle — topoLevels(checkConvergence = true) throws rather than
    // guesses when the bound can't separate a deep DAG from a cycle.
    val screened = toGraphX(g).stronglyConnectedComponents(maxIters)
      .vertices.map { case (id, c) => (id, c) }
    val multi = {
      import spark.implicits._
      screened.toDF("id", "component")
        .groupBy("component").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).limit(1).count() > 0
    }
    if (multi) false
    else {
      // Confirm bound from a graph-size hint: a DAG with n nodes grades
      // in < n rounds, so a bound ≥ n makes non-convergence an exact
      // cycle proof (return false), not a guess. Past the cap the throw
      // inside topoLevels stands — documented in the scaladoc above.
      val n = g.nodes.select(col("id")).distinct().count()
      val bound = math.max(math.max(maxIters.toLong, 256L),
        math.min(n, isDagConfirmCap.toLong)).toInt
      try {
        topoLevels(g, maxIters = bound, checkConvergence = true)
        true
      } catch {
        case _: IllegalStateException if bound >= n =>
          false // pigeonhole: no DAG on n nodes needs ≥ n rounds
      }
    }
  }

  /** Label propagation (reference community.rs:39): synchronous rounds in
    * which every node adopts its most frequent neighbor label, ties broken
    * to the lowest label — fully deterministic (GraphX's LPA breaks ties in
    * hash-map iteration order, which makes results unverifiable). One join
    * + two aggregations per round; label oscillation on bipartite-ish
    * structure remains possible, the same caveat as the reference.
    */
  def labelPropagation(spark: SparkSession, g: PropertyGraph, iters: Int): DataFrame = {
    val und = g.edges.select(col("src"), col("dst"))
      .unionByName(g.edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    // Adaptive strategy: broadcast-sized graphs run all rounds in one job
    // with the identical most-frequent/lowest-label update (LocalGraph).
    val nodes0 = g.nodes.select(col("id")).persist()
    val maxE = LocalGraph.maxEdges(spark)
    val uOpt = LocalGraph.collectIfAtMost(und, maxE)
    val n0Opt = if (uOpt.isDefined) LocalGraph.collectIfAtMost(nodes0, maxE) else None
    if (uOpt.isDefined && n0Opt.isDefined) {
      val nArr = n0Opt.get.map(_.getLong(0))
      val eArr = uOpt.get.map(r => (r.getLong(0), r.getLong(1)))
      Seq(und, nodes0).foreach(_.unpersist(blocking = false))
      return LocalGraph.labelPropagation(spark, nArr, eArr, iters)
    }
    nodes0.unpersist(blocking = false)
    var labels = g.nodes.select(col("id"), col("id").as("label")).localCheckpoint()
    var i = 0
    while (i < iters) {
      val counts = und
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("id"), col("nl"))
        .agg(count(lit(1)).as("c"))
      val best = counts.groupBy("id")
        .agg(min_by(col("nl"), struct((-col("c")).as("n"), col("nl"))).as("bl"))
      labels = labels.join(best, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("bl"), col("label")).as("label"))
        .localCheckpoint()
      i += 1
    }
    und.unpersist(blocking = false)
    labels
  }

  /** Single-source shortest paths with edge weights, bounded Bellman-Ford
    * via GraphX Pregel (reference shortest_path.rs:99 Dijkstra /
    * :346 Bellman-Ford). `maxHops` bounds path length (and Pregel
    * supersteps); the oracle enumerates the same bounded walk space.
    */
  def sssp(spark: SparkSession, g: PropertyGraph, source: Long,
      maxHops: Int): DataFrame = {
    import spark.implicits._
    // Adaptive strategy: broadcast-sized graphs relax in one job. Every
    // distance is a min over per-path weight sums, so the local rounds are
    // bit-identical to the Pregel supersteps.
    val we = g.edges.select(col("src"), col("dst"),
      coalesce(col("weight"), lit(1.0)).cast("double").as("w")).persist()
    LocalGraph.collectIfAtMost(we, LocalGraph.maxEdges(spark)) match {
      case Some(eRows) =>
        val eArr = eRows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        we.unpersist(blocking = false)
        return LocalGraph.sssp(spark, eArr, source, maxHops)
      case None => ()
    }
    we.unpersist(blocking = false)
    val graph = toGraphX(g).mapVertices((id, _) =>
      if (id == source) 0.0 else Double.PositiveInfinity)
    val result = graph.pregel(Double.PositiveInfinity, maxIterations = maxHops)(
      (_, dist, msg) => math.min(dist, msg),
      triplet =>
        if (triplet.srcAttr + triplet.attr < triplet.dstAttr)
          Iterator((triplet.dstId, triplet.srcAttr + triplet.attr))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    result.vertices
      .filter { case (_, d) => !d.isInfinite }
      .map { case (id, d) => (id, d) }.toDF("id", "dist")
  }

  /** SSSP run to CONVERGENCE rather than a caller-supplied hop bound — the
    * reference's Dijkstra semantics (shortest_path.rs:99 runs until the
    * frontier empties). Both execution branches already terminate on
    * quiescence: the local relaxation loop exits when a round changes no
    * distance, and Pregel stops on an empty message set — so the hop bound
    * is not needed for termination, only as an optional radius cap.
    * Precondition as for Dijkstra/Bellman-Ford: no negative-weight cycles
    * (a negative cycle relaxes forever under ANY convergence rule).
    */
  def ssspConverged(spark: SparkSession, g: PropertyGraph,
      source: Long): DataFrame =
    sssp(spark, g, source, Int.MaxValue)

  /** Strongly connected components via GraphX (reference components.rs:171).
    * Returns the lowest vertex id per SCC.
    */
  def stronglyConnectedComponents(spark: SparkSession, g: PropertyGraph,
      maxIters: Int = 20): DataFrame = {
    import spark.implicits._
    // Adaptive strategy: a broadcast-sized graph runs iterative Tarjan in
    // one pass (LocalGraph.scc, same smallest-member labels); GraphX's
    // distributed SCC is the at-scale path.
    // persist before probing: fixture graphs are often computed joins, and
    // probe + collect would otherwise run them twice
    val edges = g.edges.select(col("src"), col("dst")).persist()
    val nodes = g.nodes.select(col("id")).distinct().persist()
    try {
      val maxE = LocalGraph.maxEdges(spark)
      val eOpt = LocalGraph.collectIfAtMost(edges, maxE)
      val nOpt = if (eOpt.isDefined) LocalGraph.collectIfAtMost(nodes, maxE) else None
      if (eOpt.isDefined && nOpt.isDefined) {
        val eArr = eOpt.get.map(r => (r.getLong(0), r.getLong(1)))
        val nArr = nOpt.get.map(_.getLong(0))
        LocalGraph.scc(spark, nArr, eArr)
      } else
        toGraphX(g).stronglyConnectedComponents(maxIters)
          .vertices.map { case (id, c) => (id, c) }.toDF("id", "component")
    } finally {
      edges.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
  }

  /** Topological levels (reference components.rs:302 topo sort, recast for
    * scale): level(v) = length of the longest incoming path — a total
    * topological *grading* rather than an inherently sequential total order.
    * Iterative longest-path propagation; `maxIters` bounds DAG depth.
    */
  /** `checkConvergence=false` (default): a frontier still live at
    * `maxIters` truncates silently — the bounded-grading semantics every
    * existing caller pins. `true`: the same state THROWS instead, which is
    * what makes the grading usable as an exact acyclicity witness
    * ([[isDag]]'s confirm pass): levels converge iff no reachable cycle.
    */
  def topoLevels(g: PropertyGraph, maxIters: Int = 64,
      checkConvergence: Boolean = false): DataFrame = {
    val edges = g.edges.select(col("src"), col("dst")).persist()
    val nodes = g.nodes.select(col("id")).distinct().persist()
    // Adaptive strategy: a broadcast-sized graph computes the whole grading
    // in one job with identical synchronous-round semantics (LocalGraph);
    // the propagation loop below is the at-scale path.
    val spark = g.nodes.sparkSession
    val maxE = LocalGraph.maxEdges(spark)
    val eOpt = LocalGraph.collectIfAtMost(edges, maxE)
    val nOpt = if (eOpt.isDefined) LocalGraph.collectIfAtMost(nodes, maxE) else None
    if (eOpt.isDefined && nOpt.isDefined) {
      val eArr = eOpt.get.map(r => (r.getLong(0), r.getLong(1)))
      val nArr = nOpt.get.map(_.getLong(0))
      edges.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
      return LocalGraph.topoLevels(spark, nArr, eArr, maxIters, checkConvergence)
    }
    // FRONTIER propagation: only nodes whose level was (re)proposed last
    // round push to their out-neighbors, so a round costs O(frontier
    // out-edges) — for a tree/DAG with unique in-paths that is plain BFS,
    // O(V+E) TOTAL, vs the previous whole-graph union+re-aggregate per
    // LEVEL, O((V+E)·depth) (measured 48-54 s on the 2M-node sf10 tree —
    // this form cuts it to the sum of its level sizes). A node may be
    // re-proposed across rounds on multi-in-path DAGs (stale lower level
    // re-propagated, then corrected); the terminal per-id max over ALL
    // proposals makes that harmless, and total work stays ≤ the old
    // form's single round per extra proposal. maxIters bounds depth (and
    // terminates non-DAG inputs exactly like the old form).
    //
    // The proposal buffer is FOLDED every `foldEvery` rounds into a single
    // running per-id max (union + max + localCheckpoint, folded frames'
    // references dropped so the ContextCleaner can release their blocks):
    // on a cyclic input the frontier never drains, and an unbounded buffer
    // would pin up to maxIters full-graph checkpoint frames in the block
    // manager AND make the terminal union a maxIters-wide plan. The fold
    // caps both at foldEvery frames; its cost is one O(|acc|) aggregation
    // per foldEvery rounds — ≤ 1/foldEvery of the old per-level
    // re-aggregate form this loop replaced.
    import spark.implicits._
    val foldEvery = 8
    var acc = nodes.withColumn("level", lit(0)).localCheckpoint()
    var frontier = acc
    val pending = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    def fold(): Unit = if (pending.nonEmpty) {
      acc = (acc +: pending).reduce(_ unionByName _)
        .groupBy("id").agg(max(col("level")).as("level"))
        .localCheckpoint()
      pending.clear()
    }
    var i = 0
    var n = 1L
    while (n > 0 && i < maxIters) {
      frontier = frontier
        .join(edges.withColumnRenamed("src", "id"), "id")
        .select(col("dst").as("id"), (col("level") + 1).as("level"))
        .groupBy("id").agg(max(col("level")).as("level"))
        .localCheckpoint()
      // localCheckpoint already materialized the round; the count is a
      // near-free scan of cached blocks (checkConvergence is vestigial
      // here — an empty frontier ends the loop either way)
      n = frontier.count()
      if (n > 0) pending += frontier
      if (pending.size >= foldEvery) fold()
      i += 1
    }
    if (checkConvergence && n > 0) {
      edges.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
      throw new IllegalStateException(
        s"topoLevels did not converge within $maxIters rounds - " +
          "cyclic input or a DAG deeper than the bound")
    }
    fold()
    val levels = acc
    edges.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    levels
  }

  /** Closeness centrality over a bounded neighborhood (reference
    * centrality.rs:350): closeness(v) = reached / Σ dist within `maxDepth`
    * hops. Exact all-pairs closeness is O(V·E); the bounded form is the
    * shape that survives 100 TB (sampled sources × bounded BFS).
    */
  def boundedCloseness(g: PropertyGraph, sources: DataFrame, srcCol: String,
      rels: Seq[String], maxDepth: Int): DataFrame = {
    g.bfs(sources, srcCol, rels, maxDepth)
      .groupBy(srcCol)
      .agg(count(lit(1)).as("reached"),
        round(count(lit(1)).cast("double") / sum(col("dist")), 6).as("closeness"))
  }

  /** k-core decomposition (reference structure.rs:282): iteratively drop
    * vertices with undirected degree < k until fixpoint. DataFrame loop;
    * each iteration is one aggregation + one semi-join.
    */
  def kCore(g: PropertyGraph, k: Int, maxIters: Int = 100): DataFrame = {
    val spark = g.nodes.sparkSession
    val rawUnd = g.edges.select(col("src"), col("dst"))
      .unionByName(g.edges.select(col("dst").as("src"), col("src").as("dst")))
    // Adaptive strategy (same gate as the sibling loops): a broadcast-sized
    // graph peels every round in one job — up to maxIters × (join + agg +
    // count) scheduler round-trips otherwise, the worst job-count/work
    // ratio in the catalog. The raw (pre-distinct) pair list is what gets
    // probed, so the dedup happens on the driver, not in a shuffle.
    LocalGraph.collectIfAtMost(rawUnd, LocalGraph.maxEdges(spark)) match {
      case Some(rows) =>
        return LocalGraph.kCore(spark,
          rows.map(r => (r.getLong(0), r.getLong(1))), k, maxIters)
      case None =>
    }
    // persisted: referenced by every peel iteration — unpersisted, each of
    // up to maxIters rounds would re-run the union+distinct shuffle over
    // the whole edge table (the sibling loops all persist their `und`)
    val und = rawUnd.distinct().persist()
    var alive = und.select(col("src").as("id")).distinct().localCheckpoint()
    var aliveCount = alive.count()
    var changed = true
    var i = 0
    while (changed && i < maxIters) {
      val e = und
        .join(alive.withColumnRenamed("id", "src"), "src")
        .join(alive.select(col("id").as("dst")), "dst")
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("id"))
        .localCheckpoint() // lineage truncation (see PropertyGraph notes)
      val nKeep = keep.count()
      changed = nKeep != aliveCount // one action per iteration, not two
      aliveCount = nKeep
      alive = keep
      i += 1
    }
    und.unpersist(blocking = false)
    alive
  }

  /** DFS preorder from `start`, DISTRIBUTED for the in-degree ≤ 1 case
    * (trees/functional forests — e.g. the part-DAG tree edges q_dfs walks):
    * with at most one incoming edge per node the root path is unique, and
    * ascending-neighbor DFS preorder IS the lexicographic order of
    * zero-padded root paths (the same identity the DuckDB oracle uses). So
    * the whole traversal becomes a depth-bounded frontier loop building
    * path keys + one distributed range-partitioned sort — no driver-side
    * materialization, no node bound (the r10 sf10 gate found the bounded
    * form refusing at 2M nodes, exactly the melt-guard doing its job; this
    * is the scale path past it). General graphs (branching in-edges) fall
    * back to the bounded driver-side kernel
    * ([[BoundedAlgos.dfsPreorder]]), the reference's own positioning for
    * inherently sequential DFS (traversal.rs:198).
    *
    * Rank assignment: sortWithinPartitions after a range repartition +
    * per-partition offsets (zipWithIndex) — the distributed row_number; a
    * global `Window.orderBy` would funnel the graph through one task.
    */
  def dfsPreorder(spark: SparkSession, g: PropertyGraph, start: Long,
      maxNodes: Int = 1000000, maxDepth: Int = 10000): DataFrame = {
    import spark.implicits._
    // adaptive split (same graft.local.maxEdges gate as the other
    // algorithms): a broadcast-sized graph runs the driver kernel — one
    // collect beats ~depth distributed jobs on latency — and only a
    // genuinely large tree pays the iterative distributed form
    if (graft.graph.LocalGraph.atMost(g.edges,
        graft.graph.LocalGraph.maxEdges(spark)))
      return BoundedAlgos.dfsPreorder(spark, g, start, lit(true), maxNodes)
    // parallel edges dedup first: they cannot change a preorder (the same
    // neighbor is visited once) but they would double frontier rows AND
    // make a tree look branching to the in-degree probe (the part-DAG
    // fixture carries both k→2k and k→k+1 edges, which coincide at k=1)
    val edges = g.edges.select(col("src"), col("dst")).distinct().persist()
    val branching = edges.groupBy("dst").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).limit(1).count() > 0
    if (branching) {
      edges.unpersist(blocking = false)
      return BoundedAlgos.dfsPreorder(spark, g, start, lit(true), maxNodes)
    }
    // frontier loop: (id, path) with path = concat of lpad(id, 8) along the
    // unique root path. Ring guard: with in-degree ≤ 1 a revisited node r
    // must be re-reached over its UNIQUE in-edge — whose source already
    // expanded exactly once — so the only node that can ever be revisited
    // is `start` itself (seeded without consuming its in-edge). A constant
    // filter therefore replaces the anti-join against the (growing) visited
    // set; per-iteration work stays frontier-sized and total work O(V).
    var frontier = Seq((start, "")).toDF("id", "path").localCheckpoint()
    // levels hold DISJOINT id sets (each tree node appears exactly once),
    // so the running accumulator is a plain union — folded every few
    // rounds like topoLevels' buffer, or a deep chain would pin one
    // checkpoint frame per level AND build a maxDepth-wide terminal union
    var acc = frontier
    val pending = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    val foldEvery = 8
    def fold(): Unit = if (pending.nonEmpty) {
      acc = (acc +: pending.toSeq).reduce(_ unionByName _).localCheckpoint()
      pending.clear()
    }
    var depth = 0
    var n = 1L
    while (n > 0 && depth < maxDepth) {
      frontier = frontier.join(edges, col("id") === col("src"))
        .select(col("dst").as("id"),
          // Path component = ZERO-BIASED id (id + 2⁶³ in decimal space,
          // i.e. the unsigned reinterpretation of the signed long): a raw
          // lpad of the signed string is NOT order-preserving for negative
          // ids ('-13' < '-5' lexicographically but -13 < -5 numerically
          // too, while '-5' < '-7' is backwards), so two negative siblings
          // would sort in the wrong relative order and the distributed
          // preorder would diverge from ascending-neighbor DFS. Biased
          // values span 0..2⁶⁴-1 — at most 20 digits, and width 20 matters:
          // lpad TRUNCATES overlong inputs, so a narrower pad would
          // silently collide long ids into equal path components.
          concat(col("path"),
            lpad((col("dst").cast(org.apache.spark.sql.types.DecimalType(20, 0))
                + lit(BigDecimal("9223372036854775808"))).cast("string"),
              20, "0")).as("path"))
        .filter(col("id") =!= start)
        .localCheckpoint()
      n = frontier.count()
      if (n > 0) pending += frontier
      if (pending.size >= foldEvery) fold()
      depth += 1
    }
    // a still-live frontier at the cap means nodes would be silently MISSING
    // from the ranking (and the level-union plan would grow unboundedly) —
    // refuse loudly, like the driver kernel's node bound
    require(n == 0,
      s"dfsPreorder: traversal deeper than maxDepth=$maxDepth - raise maxDepth")
    edges.unpersist(blocking = false)
    fold()
    // distributed rank: range-sorted partitions + per-partition offsets
    val ranked = acc.orderBy("path").select(col("id")).rdd
      .zipWithIndex()
      .map { case (row, i) => (i + 1, row.getLong(0)) }
    ranked.toDF("ord", "id")
  }
}
