package graft.graph

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import scala.collection.mutable.ArrayBuffer

/** Adaptive single-stage strategies for iterative graph primitives.
  *
  * A distributed frontier loop pays one scheduler round-trip per level — the
  * right shape when the edge set is cluster-sized, but pure overhead when it
  * would fit in a broadcast. This is the same adaptivity Spark applies to
  * joins (broadcast vs shuffle, AQE): below a configurable edge-count
  * threshold (`graft.local.maxEdges`, limit-probed so the check never scans
  * more than threshold+1 rows) the traversal runs as ONE job — adjacency
  * broadcast to executors, per-seed BFS inside mapPartitions, seeds still
  * distributed across the cluster. Above it, callers keep their distributed
  * loop. Mirrors the bounded-subgraph precedent of `graft.algos.BoundedAlgos`
  * and the reference's in-memory traversals (traversal.rs) — except the
  * fallback here stays distributed rather than failing.
  */
object LocalGraph {

  val MaxEdgesKey = "graft.local.maxEdges"
  val DefaultMaxEdges = 500000L

  def maxEdges(spark: SparkSession): Long =
    spark.conf.getOption(MaxEdgesKey).map(_.toLong).getOrElse(DefaultMaxEdges)

  /** True iff `df` has at most `n` rows. CollectLimit short-circuits: this
    * never scans more than n+1 rows, so probing a 100 TB table is cheap.
    */
  def atMost(df: DataFrame, n: Long): Boolean =
    df.limit(math.min(n + 1, Int.MaxValue).toInt).count() <= n

  /** Probe and fetch in ONE job: `Some(rows)` when `df` has at most `n` rows,
    * `None` otherwise. The adaptive algorithms' `atMost(df) + df.collect()`
    * pair costs two scheduler round-trips for frames that are about to be
    * collected anyway; this halves the fixed job floor on the broadcast-sized
    * branch. The over-limit case pulls up to n+1 rows to the driver before
    * discarding them — acceptable because `n` is the broadcast threshold
    * (≤500k keys ≈ a few MB), the same bound the success path collects.
    */
  def collectIfAtMost(df: DataFrame, n: Long): Option[Array[org.apache.spark.sql.Row]] = {
    val rows = df.limit(math.min(n + 1, Int.MaxValue).toInt).collect()
    if (rows.length <= n) Some(rows) else None
  }

  /** Broadcast adjacency from pre-collected 2-column (src, dst) rows —
    * callers fetch them via [[collectIfAtMost]], so the broadcast-size probe
    * and the fetch share one job. Bounded by that guard.
    */
  private def adjacency(edgeRows: Array[org.apache.spark.sql.Row])
      : java.util.HashMap[Any, ArrayBuffer[Any]] = {
    val adj = new java.util.HashMap[Any, ArrayBuffer[Any]]()
    edgeRows.foreach { r =>
      adj.computeIfAbsent(r.get(0), _ => new ArrayBuffer[Any]()) += r.get(1)
    }
    adj
  }

  /** Multi-source first-discovery BFS in one job. `edges`: (src, dst) of any
    * atomic type; `seeds`: (origin, start). Output columns are named after
    * `seeds` plus `dist` (>= 1, the minimal hop count — identical semantics
    * to the distributed frontier loop). Seeds stay partitioned: per-origin
    * BFS is embarrassingly parallel across executors; only the adjacency is
    * centralized, and the caller guarantees it is broadcast-sized.
    */
  def bfs(edgeRows: Array[org.apache.spark.sql.Row], seeds: DataFrame,
      maxDepth: Int): DataFrame = {
    val spark = seeds.sparkSession
    val bc = spark.sparkContext.broadcast(adjacency(edgeRows))
    val schema = StructType(seeds.schema.fields :+ StructField("dist", IntegerType, nullable = false))
    val rows = seeds.rdd.mapPartitions { it =>
      val adj = bc.value
      it.flatMap { row =>
        val origin = row.get(0)
        val out = new ArrayBuffer[Row]()
        val seen = new java.util.HashSet[Any]()
        var frontier: List[Any] = List(row.get(1))
        seen.add(row.get(1))
        var d = 0
        while (frontier.nonEmpty && d < maxDepth) {
          d += 1
          val next = new ArrayBuffer[Any]()
          frontier.foreach { u =>
            val vs = adj.get(u)
            if (vs != null) vs.foreach { v =>
              if (seen.add(v)) { next += v; out += Row(origin, v, d) }
            }
          }
          frontier = next.toList
        }
        out.iterator
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Shortest-path BFS with parent-pointer path reconstruction in one job —
    * the below-threshold strategy for shortestPath/allShortestPaths with a
    * bound path variable (nodes(p)). Level-synchronous BFS per seed; each
    * level extends the retained shortest paths of the previous level, so the
    * work is output-bounded (all = true) or node-bounded (all = false: only
    * the lexicographically smallest path per node survives a level — its
    * prefix is provably the min path to the parent, so per-level pruning is
    * lossless). This replaces simple-path enumeration (exponential on cyclic
    * or dense graphs) for the shortest-path case.
    * `edges`: (src, dst) Long pairs; `seeds`: (origin, start) Long pairs.
    * Output: (origin, dst, dist, path) with dist >= 1.
    */
  def bfsPaths(edgeRows: Array[org.apache.spark.sql.Row], seeds: DataFrame,
      maxDepth: Int, all: Boolean): DataFrame = {
    val spark = seeds.sparkSession
    import spark.implicits._
    val adj = new java.util.HashMap[Long, ArrayBuffer[Long]]()
    edgeRows.foreach { r =>
      adj.computeIfAbsent(r.getLong(0), _ => new ArrayBuffer[Long]()) += r.getLong(1)
    }
    val bc = spark.sparkContext.broadcast(adj)
    val lexLt: (Vector[Long], Vector[Long]) => Boolean = (a, b) => {
      var i = 0
      val n = math.min(a.length, b.length)
      var res = a.length < b.length // equal prefixes: shorter first
      var decided = false
      while (i < n && !decided) {
        if (a(i) != b(i)) { res = a(i) < b(i); decided = true }
        i += 1
      }
      res
    }
    seeds.as[(Long, Long)].flatMap { case (origin, start) =>
      val a = bc.value
      val out = new ArrayBuffer[(Long, Long, Int, Seq[Long])]()
      val seen = new java.util.HashSet[Long]()
      seen.add(start)
      var frontier = new java.util.HashMap[Long, ArrayBuffer[Vector[Long]]]()
      frontier.put(start, ArrayBuffer(Vector(start)))
      var d = 0
      while (!frontier.isEmpty && d < maxDepth) {
        d += 1
        val next = new java.util.HashMap[Long, ArrayBuffer[Vector[Long]]]()
        frontier.forEach { (u, paths) =>
          val vs = a.get(u)
          if (vs != null) vs.foreach { v =>
            if (!seen.contains(v)) {
              val buf = next.computeIfAbsent(v, _ => new ArrayBuffer[Vector[Long]]())
              paths.foreach { p =>
                val cand = p :+ v
                if (all) buf += cand
                else if (buf.isEmpty) buf += cand
                else if (lexLt(cand, buf(0))) buf(0) = cand
              }
            }
          }
        }
        next.forEach { (v, paths) =>
          seen.add(v)
          paths.foreach(p => out += ((origin, v, d, p)))
        }
        frontier = next
      }
      out
    }.toDF("origin", "dst", "dist", "path")
  }

  /** Walk enumeration in one job — the below-threshold strategy for
    * (unbounded) path-carrying var-length expands. Per-seed iterative DFS
    * over the broadcast adjacency with the per-path visited guard: identical
    * semantics to the distributed `varLengthExpandPaths` loop, minus its
    * per-level scheduler round-trips (which dominate when the subgraph is
    * broadcast-sized — measured 57 s → sub-second on a 30-node DAG).
    * `edgeUnique = false`: node-unique simple paths, `edges` = (src, dst)
    * Long pairs. `edgeUnique = true`: openCypher relationship-unique walks
    * (nodes may repeat, edges may not), `edges` = (src, dst, eid).
    * `seeds`: (origin, start) Long pairs.
    * Output: (origin, dst, hops, path) with path the full node-id walk.
    */
  def simplePaths(edgeRows: Array[org.apache.spark.sql.Row], seeds: DataFrame,
      minHops: Int, cap: Int, edgeUnique: Boolean = false): DataFrame = {
    val spark = seeds.sparkSession
    import spark.implicits._
    val adj = new java.util.HashMap[Long, ArrayBuffer[(Long, Long)]]()
    edgeRows.foreach { r =>
      val eid = if (edgeUnique) r.getLong(2) else 0L
      adj.computeIfAbsent(r.getLong(0), _ => new ArrayBuffer[(Long, Long)]()) +=
        ((r.getLong(1), eid))
    }
    val bc = spark.sparkContext.broadcast(adj)
    seeds.as[(Long, Long)].flatMap { case (origin, start) =>
      val a = bc.value
      val out = new ArrayBuffer[(Long, Long, Int, Seq[Long])]()
      // explicit stack of (reversed node path, used edge ids) — recursion
      // depth = path length, which can reach `cap` (chain graphs)
      var stack: List[(List[Long], List[Long])] = List((List(start), Nil))
      while (stack.nonEmpty) {
        val (p, used) = stack.head
        stack = stack.tail
        val u = p.head
        val depth = p.length - 1
        if (depth >= minHops) out += ((origin, u, depth, p.reverse))
        if (depth < cap) {
          val vs = a.get(u)
          if (vs != null) vs.foreach { case (v, eid) =>
            if (edgeUnique) {
              if (!used.contains(eid)) stack = ((v :: p, eid :: used)) :: stack
            } else if (!p.contains(v)) stack = ((v :: p, used)) :: stack
          }
        }
      }
      out
    }.toDF("origin", "dst", "hops", "path")
  }

  /** Longest-incoming-path levels in one job — synchronous rounds identical
    * to the distributed propagation in `Algos.topoLevels` (bounded by
    * `maxIters`, so cyclic graphs converge to the same capped values).
    * Returns (id: Long, level: Int).
    */
  def topoLevels(spark: SparkSession, nodeIds: Array[Long],
      edges: Array[(Long, Long)], maxIters: Int,
      checkConvergence: Boolean = false): DataFrame = {
    import spark.implicits._
    val level = new java.util.HashMap[Long, Int]()
    nodeIds.foreach(level.put(_, 0))
    var changed = true
    var i = 0
    while (changed && i < maxIters) {
      changed = false
      // synchronous round: read last round's levels, write the next
      val snap = new java.util.HashMap[Long, Int](level)
      edges.foreach { case (s, d) =>
        val cand = snap.getOrDefault(s, 0) + 1
        if (cand > level.getOrDefault(d, 0)) { level.put(d, cand); changed = true }
      }
      i += 1
    }
    if (checkConvergence && changed)
      throw new IllegalStateException(
        s"topoLevels did not converge within $maxIters rounds - " +
          "cyclic input or a DAG deeper than the bound")
    nodeIds.map(id => (id, level.getOrDefault(id, 0))).toSeq.toDF("id", "level")
  }

  /** PageRank, fixed synchronous iterations in one job — the identical
    * recursion to `Algos.pageRankDF` (r ← (1−d) + d·Σ r(u)/outdeg(u), ranks
    * read from the previous round). Summation order differs from the
    * distributed aggregation only in floating ulps, which callers already
    * absorb by rounding (the same tolerance the DuckDB oracle needs).
    */
  def pageRank(spark: SparkSession, nodeIds: Array[Long],
      edges: Array[(Long, Long)], iters: Int, damping: Double): DataFrame = {
    import spark.implicits._
    val outdeg = new java.util.HashMap[Long, Int]()
    edges.foreach { case (s, _) => outdeg.merge(s, 1, (a, b) => a + b) }
    var rank = new java.util.HashMap[Long, Double]()
    nodeIds.foreach(rank.put(_, 1.0))
    for (_ <- 1 to iters) {
      val sums = new java.util.HashMap[Long, Double]()
      edges.foreach { case (s, d) =>
        // sources outside the node set contribute nothing (the distributed
        // plan inner-joins contributions against the rank frame). NB: the
        // boxed-map get() unboxes a missing key to 0.0, so membership must
        // be an explicit containsKey.
        if (rank.containsKey(s)) sums.merge(d, rank.get(s) / outdeg.get(s), (a, b) => a + b)
      }
      val next = new java.util.HashMap[Long, Double]()
      nodeIds.foreach { v =>
        next.put(v, (1.0 - damping) + damping * sums.getOrDefault(v, 0.0))
      }
      rank = next
    }
    nodeIds.map(v => (v, rank.get(v).doubleValue())).toSeq.toDF("id", "rank")
  }

  /** Canonical undirected simple view plus the per-vertex triangle and
    * distinct-neighbor degree maps — the shared core of the local
    * clustering kernels. Semantics match GraphX TriangleCount after its
    * canonicalization (self-loops dropped, parallel edges and orientations
    * merged) and `Algos.undirectedDeg` (distinct neighbors). tri(v) is
    * accumulated as Σ_{edges (v,u)} |N(v)∩N(u)| and halved at the end —
    * each triangle contributes exactly 2 per member vertex, so the halves
    * are exact integers.
    */
  private def triangleAndDegree(edges: Array[(Long, Long)])
      : (java.util.HashMap[Long, Long], java.util.HashMap[Long, Long]) = {
    val ud = new java.util.HashSet[(Long, Long)]()
    edges.foreach { case (s, d) =>
      if (s != d) ud.add(if (s < d) (s, d) else (d, s))
    }
    val adj = new java.util.HashMap[Long, java.util.HashSet[Long]]()
    ud.forEach { p =>
      adj.computeIfAbsent(p._1, _ => new java.util.HashSet[Long]()).add(p._2)
      adj.computeIfAbsent(p._2, _ => new java.util.HashSet[Long]()).add(p._1)
    }
    val acc = new java.util.HashMap[Long, Long]()
    ud.forEach { p =>
      val na = adj.get(p._1)
      val nb = adj.get(p._2)
      val (small, big) = if (na.size <= nb.size) (na, nb) else (nb, na)
      var c = 0L
      val it = small.iterator()
      while (it.hasNext) { if (big.contains(it.next())) c += 1 }
      if (c > 0) {
        acc.merge(p._1, c, (x, y) => x + y)
        acc.merge(p._2, c, (x, y) => x + y)
      }
    }
    val tri = new java.util.HashMap[Long, Long]()
    acc.forEach((v, c) => tri.put(v, c / 2))
    val deg = new java.util.HashMap[Long, Long]()
    adj.forEach((v, ns) => deg.put(v, ns.size.toLong))
    (tri, deg)
  }

  /** Spark's `round(x, 6)` on doubles (Round expression: BigDecimal
    * HALF_UP), replicated so local coefficients are bit-identical.
    */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Per-vertex triangle counts in one job — vertex set is nodes plus edge
    * endpoints, like `Algos.toGraphX` (the Graph constructor adds endpoint
    * vertices missing from the node RDD).
    */
  def triangleCounts(spark: SparkSession, nodeIds: Array[Long],
      edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val (tri, deg) = triangleAndDegree(edges)
    val vs = new java.util.LinkedHashSet[Long]()
    nodeIds.foreach(vs.add)
    deg.keySet().forEach(v => vs.add(v))
    edges.foreach { case (s, d) => vs.add(s); vs.add(d) } // self-loop-only endpoints
    vs.toArray(Array.empty[java.lang.Long])
      .map(v => (v.longValue(), tri.getOrDefault(v.longValue(), 0L)))
      .toSeq.toDF("id", "triangles")
  }

  /** Local clustering coefficients in one job — one row per distinct node
    * id (isolated nodes score deg 0 / coeff 0), identical formula and
    * rounding to `Algos.clusteringCoefficients`.
    */
  def clusteringCoefficients(spark: SparkSession, nodeIds: Array[Long],
      edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val (tri, deg) = triangleAndDegree(edges)
    nodeIds.distinct.map { v =>
      val d = deg.getOrDefault(v, 0L)
      val c =
        if (d >= 2) round6(tri.getOrDefault(v, 0L).toDouble * 2 / (d * (d - 1)))
        else 0.0
      (v, d, c)
    }.toSeq.toDF("id", "deg", "coeff")
  }

  /** Global clustering coefficient in one job — same sums and rounding as
    * `Algos.globalClustering` (edge-derived vertex set).
    */
  def globalClustering(spark: SparkSession, edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val (tri, deg) = triangleAndDegree(edges)
    var sumTri = 0L
    var wedges2 = 0L
    val it = deg.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      sumTri += tri.getOrDefault(e.getKey, 0L)
      wedges2 += e.getValue * (e.getValue - 1)
    }
    Seq(round6(sumTri.toDouble / math.max(wedges2.toDouble / 2, 1.0)))
      .toDF("global_coeff")
  }

  /** k-core peel in one job — identical semantics to `Algos.kCore`'s
    * DataFrame loop: dedup the doubled pair list (the distributed und is
    * `.distinct()`), alive starts as every endpoint, each round keeps the
    * nodes whose alive-to-alive degree is ≥ k, until fixpoint or maxIters.
    * Collapses up to maxIters × (join+agg+count) scheduler round-trips into
    * one CollectLimit probe for broadcast-sized graphs.
    */
  def kCore(spark: SparkSession, undEdges: Array[(Long, Long)], k: Int,
      maxIters: Int): DataFrame = {
    import spark.implicits._
    val pairs = undEdges.distinct
    val alive = new java.util.HashSet[Long]()
    pairs.foreach(p => alive.add(p._1))
    var changed = true
    var i = 0
    while (changed && i < maxIters) {
      val deg = new java.util.HashMap[Long, Long]()
      pairs.foreach { case (s, d) =>
        if (alive.contains(s) && alive.contains(d))
          deg.merge(s, 1L, (a, b) => a + b)
      }
      val keep = new java.util.HashSet[Long]()
      deg.forEach((v, c) => if (c >= k) keep.add(v))
      changed = keep.size != alive.size
      alive.clear()
      alive.addAll(keep)
      i += 1
    }
    val ids = alive.toArray(Array.empty[java.lang.Long]).map(_.longValue()).sorted
    ids.toSeq.toDF("id")
  }

  /** Label propagation, synchronous rounds in one job — identical semantics
    * to `Algos.labelPropagation`: adopt the most frequent neighbor label,
    * ties to the lowest label, isolated nodes keep theirs. `undEdges` is the
    * already-doubled undirected pair list.
    */
  def labelPropagation(spark: SparkSession, nodeIds: Array[Long],
      undEdges: Array[(Long, Long)], iters: Int): DataFrame = {
    import spark.implicits._
    val adj = new java.util.HashMap[Long, ArrayBuffer[Long]]()
    undEdges.foreach { case (s, d) =>
      adj.computeIfAbsent(s, _ => new ArrayBuffer[Long]()) += d
    }
    var label = new java.util.HashMap[Long, Long]()
    nodeIds.foreach(v => label.put(v, v))
    for (_ <- 1 to iters) {
      val next = new java.util.HashMap[Long, Long]()
      val snap = label
      nodeIds.foreach { v =>
        val ns = adj.get(v)
        if (ns == null) next.put(v, snap.get(v))
        else {
          val counts = new java.util.HashMap[Long, Int]()
          ns.foreach { n =>
            if (snap.containsKey(n)) counts.merge(snap.get(n), 1, (a, b) => a + b)
          }
          var bestL = Long.MaxValue
          var bestC = -1
          counts.forEach { (l, c) =>
            if (c > bestC || (c == bestC && l < bestL)) { bestC = c; bestL = l }
          }
          next.put(v, if (bestC < 0) snap.get(v) else bestL)
        }
      }
      label = next
    }
    nodeIds.map(v => (v, label.get(v).longValue())).toSeq.toDF("id", "label")
  }

  /** Bounded Bellman-Ford in one job — synchronous relaxation rounds reading
    * the previous round's distances, exactly the Pregel superstep semantics
    * of `Algos.sssp` (each distance is a min over per-path sums, so results
    * are bit-identical to the distributed run). Returns reached (id, dist).
    */
  def sssp(spark: SparkSession, edges: Array[(Long, Long, Double)],
      source: Long, maxHops: Int): DataFrame = {
    import spark.implicits._
    val dist = new java.util.HashMap[Long, Double]()
    dist.put(source, 0.0)
    var changed = true
    var i = 0
    while (changed && i < maxHops) {
      changed = false
      val snap = new java.util.HashMap[Long, Double](dist)
      edges.foreach { case (s, d, w) =>
        // explicit containsKey: the boxed map unboxes missing keys to 0.0
        if (snap.containsKey(s)) {
          val cand = snap.get(s) + w
          if (!dist.containsKey(d) || cand < dist.get(d)) {
            dist.put(d, cand); changed = true
          }
        }
      }
      i += 1
    }
    val rows = dist.entrySet().iterator()
    val out = new ArrayBuffer[(Long, Double)]()
    while (rows.hasNext) { val e = rows.next(); out += ((e.getKey, e.getValue)) }
    out.toSeq.toDF("id", "dist")
  }

  /** Louvain phase-1, synchronous rounds in one job — identical update rule
    * to `Louvain.run`: every node adopts the neighboring community with the
    * best modularity gain w(i→C) − k_i·Σtot(C)/2m, ties to the lowest
    * community id. On integer-weight graphs every sum is exact in doubles,
    * so local and distributed runs agree bit-for-bit. `und` is the doubled
    * weighted pair list.
    */
  def louvain(spark: SparkSession, und: Array[(Long, Long, Double)],
      maxIters: Int): DataFrame = {
    import spark.implicits._
    val adj = new java.util.HashMap[Long, ArrayBuffer[(Long, Double)]]()
    val k = new java.util.HashMap[Long, Double]()
    var m2 = 0.0
    und.foreach { case (s, d, w) =>
      adj.computeIfAbsent(s, _ => new ArrayBuffer[(Long, Double)]()) += ((d, w))
      k.merge(s, w, (a, b) => a + b)
      m2 += w
    }
    val nodeIds = k.keySet().toArray(Array.empty[java.lang.Long]).map(_.longValue()).sorted
    var comm = new java.util.HashMap[Long, Long]()
    nodeIds.foreach(v => comm.put(v, v))
    var i = 0
    var stable = false
    while (i < maxIters && !stable) {
      val tot = new java.util.HashMap[Long, Double]()
      nodeIds.foreach(v => tot.merge(comm.get(v), k.get(v), (a, b) => a + b))
      val next = new java.util.HashMap[Long, Long]()
      stable = true
      nodeIds.foreach { v =>
        val ns = adj.get(v)
        if (ns == null) next.put(v, comm.get(v))
        else {
          val wToC = new java.util.HashMap[Long, Double]()
          ns.foreach { case (n, w) => wToC.merge(comm.get(n), w, (a, b) => a + b) }
          val kv = k.get(v)
          var bestC = Long.MaxValue
          var bestG = Double.NegativeInfinity
          wToC.forEach { (c, wic) =>
            val g = wic - kv * tot.get(c) / m2
            if (g > bestG || (g == bestG && c < bestC)) { bestG = g; bestC = c }
          }
          val nc = if (bestG == Double.NegativeInfinity) comm.get(v).longValue() else bestC
          if (nc != comm.get(v)) stable = false
          next.put(v, nc)
        }
      }
      comm = next
      i += 1
    }
    nodeIds.map(v => (v, comm.get(v).longValue())).toSeq.toDF("id", "comm")
  }

  /** Strongly connected components (iterative Tarjan) in one job. Returns
    * (id, component = smallest member id), matching the GraphX convention
    * the distributed path produces. Runs on the driver — bounded by the
    * caller's edge/node guard, the `BoundedAlgos` contract.
    */
  def scc(spark: SparkSession, nodeIds: Array[Long],
      edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val comp = sccLocal(nodeIds, edges)
    nodeIds.map(id => (id, comp.getOrDefault(id, id))).toSeq.toDF("id", "component")
  }

  /** The driver-side half of [[scc]]: node → component (smallest member id),
    * no Spark job at all. Callers that only need a driver-side predicate of
    * the components (e.g. `isDag`'s "any multi-node component?") use this
    * directly instead of paying a parallelize + shuffle to re-aggregate data
    * that was already local.
    */
  def sccLocal(nodeIds: Array[Long],
      edges: Array[(Long, Long)]): java.util.HashMap[Long, Long] = {
    val adj = new java.util.HashMap[Long, ArrayBuffer[Long]]()
    edges.foreach { case (s, d) => adj.computeIfAbsent(s, _ => new ArrayBuffer[Long]()) += d }
    val index = new java.util.HashMap[Long, Int]()
    val low = new java.util.HashMap[Long, Int]()
    val onStack = new java.util.HashSet[Long]()
    val stack = new ArrayBuffer[Long]()
    val comp = new java.util.HashMap[Long, Long]()
    var counter = 0
    // explicit work stack — recursion depth is the longest path, which
    // overflows the JVM stack on chain graphs
    nodeIds.foreach { root =>
      if (!index.containsKey(root)) {
        val work = new ArrayBuffer[(Long, Int)]() // (node, next child offset)
        work += ((root, 0))
        while (work.nonEmpty) {
          val (v, ci) = work.last
          if (ci == 0) {
            index.put(v, counter); low.put(v, counter); counter += 1
            stack += v; onStack.add(v)
          }
          val children = adj.getOrDefault(v, ArrayBuffer.empty)
          var advanced = false
          var i = ci
          while (i < children.length && !advanced) {
            val w = children(i)
            if (!index.containsKey(w)) {
              work(work.length - 1) = (v, i + 1)
              work += ((w, 0))
              advanced = true
            } else {
              if (onStack.contains(w) && low.get(w) < low.get(v)) low.put(v, low.get(w))
              i += 1
            }
          }
          if (!advanced) {
            work.remove(work.length - 1)
            if (work.nonEmpty) {
              val (p, _) = work.last
              if (low.get(v) < low.get(p)) low.put(p, low.get(v))
            }
            if (low.get(v) == index.get(v)) {
              // pop the component, label with its smallest id
              val members = new ArrayBuffer[Long]()
              var done = false
              while (!done) {
                val w = stack.remove(stack.length - 1)
                onStack.remove(w)
                members += w
                if (w == v) done = true
              }
              val label = members.min
              members.foreach(comp.put(_, label))
            }
          }
        }
      }
    }
    comp
  }
}
