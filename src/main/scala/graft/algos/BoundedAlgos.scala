package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import scala.collection.mutable

/** Inherently sequential graph algorithms (reference betweenness
  * centrality.rs:240 Brandes; max-flow flow.rs:88; Kruskal MST mst.rs:87;
  * articulation points structure.rs:36) — executed driver-side on a bounded
  * induced subgraph, exactly the reference's own positioning for these ops
  * at scale (SURVEY §2.6: "driver-side on induced subgraph, documented size
  * bounds").
  *
  * `maxNodes` is a hard bound: exceeding it throws rather than silently
  * melting the driver. The *extraction* of the subgraph is distributed
  * (filters + joins); only the O(V·E) kernel runs locally.
  */
object BoundedAlgos {

  private def collectSubgraph(g: PropertyGraph, nodeFilter: org.apache.spark.sql.Column,
      maxNodes: Int): (Array[Long], Array[(Long, Long, Double)]) = {
    // probe-and-collect in ONE CollectLimit job (r18, same fusion as
    // LocalGraph.collectIfAtMost): the former count + collect pair cost two
    // scheduler round-trips, and the semi-join sides below broadcast the
    // ALREADY-COLLECTED ids, so nothing else evaluates the filtered frame
    val probe = g.nodes.filter(nodeFilter).select(col("id"))
      .limit(math.min(maxNodes.toLong + 1, Int.MaxValue.toLong).toInt).collect()
    if (probe.length > maxNodes)
      throw new IllegalArgumentException(
        s"induced subgraph has > $maxNodes nodes — refusing driver-side run")
    val ids = probe.map(_.getLong(0))
    // induce edges DISTRIBUTIVELY before collecting: semi-join both endpoints
    // against the bounded node set (broadcast from the ALREADY-COLLECTED
    // ids — a LocalRelation, zero further evaluations of the filter);
    // collecting the full edge table would OOM the driver on a large graph
    // regardless of the node bound
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val idDf = ids.toSeq.toDF("id")
    val edges = g.edges
      .select(col("src"), col("dst"), coalesce(col("weight"), lit(1.0)).as("w"))
      .join(broadcast(idDf), col("src") === col("id"), "left_semi")
      .join(broadcast(idDf), col("dst") === col("id"), "left_semi")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    (ids, edges)
  }

  /** Brandes betweenness centrality (centrality.rs:240), unweighted,
    * undirected, on the bounded induced subgraph. Returns (id, betweenness).
    */
  def betweenness(spark: SparkSession, g: PropertyGraph,
      nodeFilter: org.apache.spark.sql.Column, maxNodes: Int = 2000): DataFrame = {
    val (ids, edges) = collectSubgraph(g, nodeFilter, maxNodes)
    // Brandes runs on the undirected SIMPLE view (like every other
    // undirected kernel here): reciprocal directed edges must collapse to
    // one neighbor entry, or sigma through the doubled neighbor inflates
    // and skews the dependency split; self-loops never lie on a shortest
    // path between distinct nodes
    val adj = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
    val seen = mutable.Set.empty[(Long, Long)]
    edges.foreach { case (s, d, _) =>
      if (s != d && seen.add((math.min(s, d), math.max(s, d)))) {
        adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d
        adj.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += s
      }
    }
    val bc = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    for (s <- ids) {
      val stack = mutable.Stack.empty[Long]
      val pred = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
      val sigma = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      val dist = mutable.Map.empty[Long, Int]
      sigma(s) = 1.0
      dist(s) = 0
      val queue = mutable.Queue(s)
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        stack.push(v)
        for (w <- adj.getOrElse(v, Nil)) {
          if (!dist.contains(w)) { dist(w) = dist(v) + 1; queue.enqueue(w) }
          if (dist(w) == dist(v) + 1) {
            sigma(w) += sigma(v)
            pred.getOrElseUpdate(w, mutable.ArrayBuffer.empty) += v
          }
        }
      }
      val delta = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      while (stack.nonEmpty) {
        val w = stack.pop()
        for (v <- pred.getOrElse(w, Nil))
          delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
        if (w != s) bc(w) += delta(w)
      }
    }
    import spark.implicits._
    // undirected: each pair counted twice
    ids.map(id => (id, bc(id) / 2.0)).toSeq.toDF("id", "betweenness")
  }

  /** Kruskal minimum spanning forest (mst.rs:87) on the bounded induced
    * subgraph (undirected view). Returns the chosen edges (src, dst, w).
    */
  def mstKruskal(spark: SparkSession, g: PropertyGraph,
      nodeFilter: org.apache.spark.sql.Column, maxNodes: Int = 5000): DataFrame = {
    val (ids, edges) = collectSubgraph(g, nodeFilter, maxNodes)
    val parent = mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    val chosen = mutable.ArrayBuffer.empty[(Long, Long, Double)]
    // deterministic order: by weight, then endpoints
    for ((s, d, w) <- edges.sortBy { case (s, d, w) => (w, s, d) }) {
      val (rs, rd) = (find(s), find(d))
      if (rs != rd) { parent(rs) = rd; chosen += ((s, d, w)) }
    }
    import spark.implicits._
    chosen.toSeq.toDF("src", "dst", "w")
  }

  /** Prim MST (reference mst.rs:177) on the bounded induced subgraph,
    * undirected view, min-heap keyed (w, storedSrc, storedDst) for a
    * deterministic tie-break. With distinct weights the MST is unique, so
    * Prim agrees edge-for-edge with [[mstKruskal]] (one shared closed-form
    * oracle). Runs as a forest: one tree per component, seeded at each
    * component's minimum id. Output edges keep their stored orientation.
    */
  def mstPrim(spark: SparkSession, g: PropertyGraph,
      nodeFilter: org.apache.spark.sql.Column, maxNodes: Int = 5000): DataFrame = {
    val (ids, edges) = collectSubgraph(g, nodeFilter, maxNodes)
    // (w, neighbor, storedSrc, storedDst)
    val adj = mutable.Map.empty[Long, mutable.ArrayBuffer[(Double, Long, Long, Long)]]
    edges.foreach { case (s, d, w) =>
      adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += ((w, d, s, d))
      adj.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += ((w, s, s, d))
    }
    val visited = mutable.Set.empty[Long]
    val chosen = mutable.ArrayBuffer.empty[(Long, Long, Double)]
    implicit val minHeap: Ordering[(Double, Long, Long, Long)] =
      Ordering.by[(Double, Long, Long, Long), (Double, Long, Long)](
        t => (t._1, t._3, t._4)).reverse
    for (seed <- ids.sorted if !visited.contains(seed)) {
      visited += seed
      val pq = mutable.PriorityQueue.empty[(Double, Long, Long, Long)]
      adj.getOrElse(seed, Nil).foreach(pq.enqueue(_))
      while (pq.nonEmpty) {
        val (w, other, ss, sd) = pq.dequeue()
        if (!visited.contains(other)) {
          visited += other
          chosen += ((ss, sd, w))
          adj.getOrElse(other, Nil)
            .foreach(e => if (!visited.contains(e._2)) pq.enqueue(e))
        }
      }
    }
    import spark.implicits._
    chosen.toSeq.toDF("src", "dst", "w")
  }

  /** Min-cost max-flow (reference flow.rs:254) via successive shortest
    * paths with Bellman-Ford on the residual graph (costs stay conservative
    * because residual arcs carry negated cost), on the bounded induced
    * subgraph. Capacities come from the edge weight; `costOf(src, dst)`
    * supplies the per-unit arc cost. Returns (maxFlow, minCost).
    */
  def minCostMaxFlow(g: PropertyGraph, nodeFilter: org.apache.spark.sql.Column,
      source: Long, sink: Long, costOf: (Long, Long) => Double,
      maxNodes: Int = 2000): (Double, Double) = {
    val (_, edges) = collectSubgraph(g, nodeFilter, maxNodes)
    // ARC-indexed residual network (successive shortest paths): each
    // directed edge is arc 2i with its residual twin 2i+1 (cap 0, cost −c).
    // Keying cap/cost by (u, v) PAIRS — the previous form — clobbered
    // antiparallel inputs: with both (s,d) and (d,s) present, whichever
    // edge loaded last overwrote the other's (even negated) cost, and a
    // residual arc shared its key with the real reverse edge, conflating
    // flow cancellation with real capacity.
    val from = mutable.ArrayBuffer.empty[Long]
    val to = mutable.ArrayBuffer.empty[Long]
    val cap = mutable.ArrayBuffer.empty[Double]
    val cost = mutable.ArrayBuffer.empty[Double]
    val nodes = mutable.LinkedHashSet.empty[Long]
    edges.foreach { case (s, d, w) =>
      from += s; to += d; cap += w; cost += costOf(s, d)
      from += d; to += s; cap += 0.0; cost += -costOf(s, d)
      nodes += s += d
    }
    var totalFlow = 0.0
    var totalCost = 0.0
    var augmenting = true
    while (augmenting) {
      // Bellman-Ford over residual arcs (handles the negative back-arcs)
      val dist = mutable.Map.empty[Long, Double].withDefaultValue(Double.MaxValue)
      val prevArc = mutable.Map.empty[Long, Int]
      dist(source) = 0.0
      var changed = true
      var rounds = 0
      while (changed && rounds <= nodes.size) {
        changed = false
        var i = 0
        while (i < from.length) {
          if (cap(i) > 1e-12 && dist(from(i)) < Double.MaxValue) {
            val nd = dist(from(i)) + cost(i)
            if (nd < dist(to(i)) - 1e-12) {
              dist(to(i)) = nd; prevArc(to(i)) = i; changed = true
            }
          }
          i += 1
        }
        rounds += 1
      }
      if (!prevArc.contains(sink)) augmenting = false
      else {
        var bottleneck = Double.MaxValue
        var v = sink
        while (v != source) {
          val a = prevArc(v); bottleneck = math.min(bottleneck, cap(a)); v = from(a)
        }
        v = sink
        while (v != source) {
          val a = prevArc(v)
          cap(a) -= bottleneck
          cap(a ^ 1) += bottleneck // the paired twin, by construction
          v = from(a)
        }
        totalFlow += bottleneck
        totalCost += bottleneck * dist(sink)
      }
    }
    (totalFlow, totalCost)
  }

  /** Articulation points + bridges via Tarjan low-link (structure.rs:36,
    * :150) on the bounded induced subgraph (undirected). Returns
    * (articulation point ids, bridge edges (min,max)).
    */
  def articulation(g: PropertyGraph, nodeFilter: org.apache.spark.sql.Column,
      maxNodes: Int = 2000): (Set[Long], Set[(Long, Long)]) = {
    val (ids, edges) = collectSubgraph(g, nodeFilter, maxNodes)
    // undirected simple view (reciprocal directed edges = one undirected
    // edge; self-loops never separate a graph)
    val adj = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
    val seen = mutable.Set.empty[(Long, Long)]
    edges.foreach { case (s, d, _) =>
      if (s != d && seen.add((math.min(s, d), math.max(s, d)))) {
        adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d
        adj.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += s
      }
    }
    val disc = mutable.Map.empty[Long, Int]
    val low = mutable.Map.empty[Long, Int]
    val aps = mutable.Set.empty[Long]
    val bridges = mutable.Set.empty[(Long, Long)]
    var timer = 0
    // parent as Option: a -1L sentinel collides with node id -1, which is
    // a legal id (negative ids are exercised inputs) — a vertex whose DFS
    // parent is node -1 would take the root rule and be misclassified
    def dfs(u: Long, parent: Option[Long]): Unit = {
      disc(u) = timer; low(u) = timer; timer += 1
      var children = 0
      for (v <- adj.getOrElse(u, Nil)) {
        if (!disc.contains(v)) {
          children += 1
          dfs(v, Some(u))
          low(u) = math.min(low(u), low(v))
          if (parent.isDefined && low(v) >= disc(u)) aps += u
          if (low(v) > disc(u)) bridges += ((math.min(u, v), math.max(u, v)))
        } else if (!parent.contains(v)) low(u) = math.min(low(u), disc(v))
      }
      if (parent.isEmpty && children > 1) aps += u
    }
    for (id <- ids if !disc.contains(id)) dfs(id, None)
    (aps.toSet, bridges.toSet)
  }

  /** Edmonds–Karp max-flow (flow.rs:88) between two nodes of the bounded
    * induced subgraph; edge capacities = weight. Returns the flow value.
    */
  def maxFlow(g: PropertyGraph, nodeFilter: org.apache.spark.sql.Column,
      source: Long, sink: Long, maxNodes: Int = 2000): Double = {
    val (_, edges) = collectSubgraph(g, nodeFilter, maxNodes)
    val cap = mutable.Map.empty[(Long, Long), Double].withDefaultValue(0.0)
    val adj = mutable.Map.empty[Long, mutable.LinkedHashSet[Long]]
    edges.foreach { case (s, d, w) =>
      cap((s, d)) += w
      adj.getOrElseUpdate(s, mutable.LinkedHashSet.empty) += d
      adj.getOrElseUpdate(d, mutable.LinkedHashSet.empty) += s // residual arc
    }
    var flow = 0.0
    var augmenting = true
    while (augmenting) {
      // BFS for the shortest augmenting path
      val prev = mutable.Map.empty[Long, Long]
      val queue = mutable.Queue(source)
      prev(source) = source
      while (queue.nonEmpty && !prev.contains(sink)) {
        val v = queue.dequeue()
        for (w <- adj.getOrElse(v, Nil) if !prev.contains(w) && cap((v, w)) > 1e-12) {
          prev(w) = v
          queue.enqueue(w)
        }
      }
      if (!prev.contains(sink)) augmenting = false
      else {
        var bottleneck = Double.MaxValue
        var v = sink
        while (v != source) { bottleneck = math.min(bottleneck, cap((prev(v), v))); v = prev(v) }
        v = sink
        while (v != source) {
          cap((prev(v), v)) -= bottleneck
          cap((v, prev(v))) += bottleneck
          v = prev(v)
        }
        flow += bottleneck
      }
    }
    flow
  }

  /** Floyd–Warshall all-pairs shortest distances (reference
    * shortest_path.rs:506) on the bounded induced subgraph — the classic
    * O(V³) triple loop, exactly the reference's positioning: all-pairs is
    * driver-side-on-a-bounded-subgraph material at any scale (distributed
    * APSP is V × SSSP, which q_sssp already covers). Returns (src, dst,
    * dist) for reachable pairs, src ≠ dst.
    */
  def floydWarshall(spark: SparkSession, g: PropertyGraph,
      nodeFilter: org.apache.spark.sql.Column, maxNodes: Int = 500): DataFrame = {
    val (ids, edges) = collectSubgraph(g, nodeFilter, maxNodes)
    val idx = ids.sorted.zipWithIndex.toMap
    val n = ids.length
    val dist = Array.fill(n, n)(Double.PositiveInfinity)
    edges.foreach { case (s, d, w) =>
      val (i, j) = (idx(s), idx(d))
      if (w < dist(i)(j)) dist(i)(j) = w
    }
    var k = 0
    while (k < n) {
      var i = 0
      while (i < n) {
        val dik = dist(i)(k)
        if (dik != Double.PositiveInfinity) {
          var j = 0
          while (j < n) {
            val nd = dik + dist(k)(j)
            if (nd < dist(i)(j)) dist(i)(j) = nd
            j += 1
          }
        }
        i += 1
      }
      k += 1
    }
    val back = ids.sorted
    import spark.implicits._
    (for {
      i <- 0 until n
      j <- 0 until n
      if i != j && dist(i)(j) != Double.PositiveInfinity
    } yield (back(i), back(j), dist(i)(j))).toDF("src", "dst", "dist")
  }

  /** A* single-pair shortest path (reference plugins/algorithms/
    * shortest_path.rs:230) with ALT landmark lower bounds (Goldberg &
    * Harrelson, SODA 2005 — "Computing the Shortest Path: A* Search Meets
    * Graph Theory"): pick `numLandmarks` landmarks, precompute exact
    * Dijkstra distances from each landmark (forward) and to each landmark
    * (reverse), and use the triangle-inequality bound
    *
    *   h(v) = max_L max( d(v,L) − d(t,L),  d(L,t) − d(L,v) ) ∨ 0
    *
    * which is admissible AND consistent on any nonnegative-weighted graph —
    * schema-free included, resolving the earlier "no admissible heuristic"
    * deferral (h = 0 degrades to Dijkstra; pass numLandmarks = 0 for that).
    * Runs driver-side on the bounded induced subgraph (BoundedAlgos
    * contract); the landmark tables are shared across all targets.
    *
    * Returns one row per reachable target: (id, dist, settled), `settled` =
    * nodes popped by that A* run (the spec asserts settled < Dijkstra's).
    */
  def aStar(spark: SparkSession, g: PropertyGraph,
      nodeFilter: org.apache.spark.sql.Column, source: Long, targets: Seq[Long],
      numLandmarks: Int = 4, maxNodes: Int = 5000): DataFrame = {
    val (ids, edges) = collectSubgraph(g, nodeFilter, maxNodes)
    val fwd = mutable.Map.empty[Long, mutable.ArrayBuffer[(Long, Double)]]
    val rev = mutable.Map.empty[Long, mutable.ArrayBuffer[(Long, Double)]]
    edges.foreach { case (s, d, w) =>
      require(w >= 0.0, s"A* needs nonnegative weights, got $w on ($s,$d)")
      fwd.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += ((d, w))
      rev.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += ((s, w))
    }
    def dijkstra(adj: mutable.Map[Long, mutable.ArrayBuffer[(Long, Double)]],
        from: Long): mutable.Map[Long, Double] = {
      val dist = mutable.Map.empty[Long, Double]
      val pq = mutable.PriorityQueue.empty[(Double, Long)](
        Ordering.by[(Double, Long), Double](_._1).reverse)
      pq.enqueue((0.0, from))
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (!dist.contains(u)) {
          dist(u) = d
          adj.getOrElse(u, Nil).foreach { case (v, w) =>
            if (!dist.contains(v)) pq.enqueue((d + w, v))
          }
        }
      }
      dist
    }
    // deterministic landmark pick: evenly spaced over the sorted id range
    // (any pick is admissible; spread improves the bound)
    val sortedIds = ids.sorted
    val lms: Seq[Long] =
      if (numLandmarks <= 0 || sortedIds.isEmpty) Nil
      else (0 until math.min(numLandmarks, sortedIds.length))
        .map(i => sortedIds(((sortedIds.length - 1).toLong * i /
          math.max(1, numLandmarks - 1)).toInt)).distinct
    val dFromL = lms.map(l => dijkstra(fwd, l)) // d(L, ·)
    val dToL   = lms.map(l => dijkstra(rev, l)) // d(·, L)
    val inf = Double.PositiveInfinity
    def h(v: Long, t: Long): Double = {
      var best = 0.0
      var i = 0
      while (i < lms.length) {
        val vToL = dToL(i).getOrElse(v, inf)
        val tToL = dToL(i).getOrElse(t, inf)
        if (vToL != inf && tToL != inf && vToL - tToL > best) best = vToL - tToL
        val lToV = dFromL(i).getOrElse(v, inf)
        val lToT = dFromL(i).getOrElse(t, inf)
        if (lToT != inf && lToV != inf && lToT - lToV > best) best = lToT - lToV
        i += 1
      }
      best
    }
    // A* per target: pop order is f = g + h; consistency of h makes the
    // first pop of the target optimal, like Dijkstra's invariant
    def run(t: Long): Option[(Double, Int)] = {
      val done = mutable.Set.empty[Long]
      val gScore = mutable.Map.empty[Long, Double]
      val pq = mutable.PriorityQueue.empty[(Double, Double, Long)](
        Ordering.by[(Double, Double, Long), Double](_._1).reverse)
      gScore(source) = 0.0
      pq.enqueue((h(source, t), 0.0, source))
      var settled = 0
      var result: Option[(Double, Int)] = None
      while (pq.nonEmpty && result.isEmpty) {
        val (_, d, u) = pq.dequeue()
        if (!done.contains(u)) {
          done += u
          settled += 1
          if (u == t) result = Some((d, settled))
          else fwd.getOrElse(u, Nil).foreach { case (v, w) =>
            val nd = d + w
            if (!done.contains(v) && nd < gScore.getOrElse(v, inf)) {
              gScore(v) = nd
              pq.enqueue((nd + h(v, t), nd, v))
            }
          }
        }
      }
      result
    }
    import spark.implicits._
    targets.flatMap(t => run(t).map { case (d, s2) => (t, d, s2) })
      .toDF("id", "dist", "settled")
  }

  /** Iterative DFS preorder (reference traversal.rs:198 DfsIterator) from
    * `start` over the bounded induced subgraph, directed edges, neighbors
    * visited in ascending id order — the deterministic visitor order an
    * oracle can reproduce. Returns (ord, id) with ord starting at 1.
    */
  def dfsPreorder(spark: SparkSession, g: PropertyGraph, start: Long,
      nodeFilter: org.apache.spark.sql.Column, maxNodes: Int = 100000): DataFrame = {
    import spark.implicits._
    val (_, edges) = collectSubgraph(g, nodeFilter, maxNodes)
    val adj = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
    edges.foreach { case (s, d, _) =>
      adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d
    }
    adj.values.foreach(b => b.sortInPlace())
    val seen = mutable.Set.empty[Long]
    val order = mutable.ArrayBuffer.empty[Long]
    val stack = mutable.Stack(start)
    while (stack.nonEmpty) {
      val v = stack.pop()
      if (!seen.contains(v)) {
        seen += v
        order += v
        // push descending so the smallest neighbor is popped (visited) first
        adj.getOrElse(v, mutable.ArrayBuffer.empty)
          .reverseIterator.foreach(stack.push)
      }
    }
    order.zipWithIndex
      .map { case (id, i) => ((i + 1).toLong, id) }.toSeq
      .toDF("ord", "id")
  }
}
