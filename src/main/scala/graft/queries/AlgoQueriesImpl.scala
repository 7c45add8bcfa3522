package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.algos.Algos
import graft.core.Tables
import graft.graph.{PropertyGraph, TpchGraph}

/** Graph-algorithm coverage (SURVEY §2.6) with deterministic SQL oracles:
  * PageRank via an unrolled fixed-iteration CTE, connected components via
  * the gaps-and-islands trick on a chain graph, triangles via 3-way
  * self-join, bounded weighted SSSP via walk enumeration.
  */
object AlgoQueriesImpl {

  private[queries] val DagSql =
    """dag AS (
      |  SELECT a.p_partkey AS src, b.p_partkey AS dst
      |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey AND a.p_partkey >= 1
      |  UNION ALL
      |  SELECT a.p_partkey, b.p_partkey
      |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey + 1 AND a.p_partkey >= 1
      |  UNION ALL
      |  SELECT a.p_partkey, b.p_partkey
      |  FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
      |)""".stripMargin

  /** One PageRank iteration as SQL, from table `prev` to the select list. */
  private def prIter(prev: String): String =
    s"""SELECT n.id AS id,
       |       0.15 + 0.85 * coalesce(sum($prev.rank / o.d), 0) AS rank
       |FROM nodes n
       |LEFT JOIN dag e ON e.dst = n.id
       |LEFT JOIN $prev ON $prev.id = e.src
       |LEFT JOIN outdeg o ON o.src = e.src
       |GROUP BY n.id""".stripMargin

  /** One integer power-iteration step as SQL, from table `prev`:
    * x(v) = Σ_{u ∈ N(v)} prev.x(u) over the undirected adjacency.
    */
  private def evIter(prev: String): String =
    s"""SELECT n.id AS id, CAST(coalesce(sum($prev.x), 0) AS BIGINT) AS x
       |FROM nodes n
       |LEFT JOIN adj a ON a.node = n.id
       |LEFT JOIN $prev ON $prev.id = a.nbr
       |GROUP BY n.id""".stripMargin

  /** Disjoint 5-cliques over part keys (group = ⌊k/5⌋; keys are 0..n−1 with
    * 5 | n at every SF, so every group is a full clique of 5). Community
    * detection converges provably here: synchronous Louvain/LPA reach
    * community = min clique member within 3 rounds (see q_louvain /
    * q_label_prop notes).
    */
  private[queries] def cliqueGraph(s: org.apache.spark.sql.SparkSession, dir: String): PropertyGraph = {
    val p = Tables.part(s, dir).select(col("p_partkey").as("k"),
      (col("p_partkey") / 5).cast("long").as("grp"))
    val q = p.select(col("k").as("k2"), col("grp").as("grp2"))
    val edges = p.join(q, col("grp") === col("grp2") && col("k") < col("k2"))
      .select(col("k").as("src"), col("k2").as("dst"),
        lit("CLIQUE").as("rel"), lit(1.0).as("weight"))
    val nodes = p.select(col("k").as("id"), array(lit("Part")).as("labels"))
    PropertyGraph(nodes, edges)
  }

  def defs: Seq[QueryDef] = Seq(

    // PageRank, 3 fixed iterations (reference centrality.rs:135; bench
    // baseline performance.md:93). DataFrame loop ≡ unrolled CTE chain.
    QueryDef(
      "q_pagerank",
      s"""WITH $DagSql,
        |nodes AS (SELECT CAST(p_partkey AS BIGINT) AS id FROM part),
        |outdeg AS (SELECT src, count(*) AS d FROM dag GROUP BY src),
        |r0 AS (SELECT id, 1.0 AS rank FROM nodes),
        |r1 AS (${prIter("r0")}),
        |r2 AS (${prIter("r1")}),
        |r3 AS (${prIter("r2")})
        |SELECT id, round(rank, 6) AS rank FROM r3
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      Algos.pageRankDF(TpchGraph.partDag(s, dir), iters = 3)
        .select(col("id"), round(col("rank"), 6).as("rank"))
        .orderBy("id")
    },

    // Eigenvector centrality (docs/algorithms/centrality.md:80 — documented
    // API the reference serves via NetworkX; native here). Integer power
    // iteration keeps every pre-normalization value exact, so the hash
    // match needs no rounding tolerance at any SF.
    QueryDef(
      "q_eigenvector",
      s"""WITH $DagSql,
        |ud AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |       FROM dag WHERE src <> dst),
        |adj AS (SELECT a AS node, b AS nbr FROM ud UNION ALL SELECT b, a FROM ud),
        |nodes AS (SELECT CAST(p_partkey AS BIGINT) AS id FROM part),
        |x0 AS (SELECT id, CAST(1 AS BIGINT) AS x FROM nodes),
        |x1 AS (${evIter("x0")}),
        |x2 AS (${evIter("x1")}),
        |x3 AS (${evIter("x2")}),
        |x4 AS (${evIter("x3")}),
        |norm AS (SELECT sqrt(CAST(sum(x * x) AS DOUBLE)) AS s FROM x4)
        |SELECT id, round(CAST(x AS DOUBLE) / greatest(s, 1.0), 6) AS score
        |FROM x4 CROSS JOIN norm
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      Algos.eigenvectorCentrality(TpchGraph.partDag(s, dir), iters = 4)
        .orderBy("id")
    },

    // Connected components (components.rs:95) on the same-brand chain graph;
    // oracle = gaps-and-islands (component = min key of each consecutive
    // same-brand run).
    QueryDef(
      "q_connected_components",
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |       CAST(min(p_partkey) OVER (PARTITION BY p_brand, p_partkey - rn) AS BIGINT) AS component
        |FROM (SELECT p_partkey, p_brand,
        |             row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn
        |      FROM part)
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir).select(col("p_partkey").as("k"), col("p_brand").as("brand"))
      val nxt = p.select(col("k").as("k2"), col("brand").as("brand2"))
      val edges = p.join(nxt, col("k2") === col("k") + 1 && col("brand2") === col("brand"))
        .select(col("k").as("src"), col("k2").as("dst"), lit("SAME_BRAND").as("rel"),
          lit(1.0).as("weight"))
      val nodes = p.select(col("k").as("id"), array(lit("Part")).as("labels"))
      Algos.connectedComponents(s, PropertyGraph(nodes, edges))
        .orderBy("id")
    },

    // Per-vertex triangle counts (clustering.rs:130) on the undirected part
    // DAG; vertices in >= 1 triangle.
    QueryDef(
      "q_triangles",
      s"""WITH $DagSql,
        |ud AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM dag),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM ud e1 JOIN ud e2 ON e2.a = e1.b
        |        JOIN ud e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT CAST(v AS BIGINT) AS id, count(*) AS triangles
        |FROM (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |GROUP BY v
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      Algos.triangleCounts(s, TpchGraph.partDag(s, dir))
        .filter(col("triangles") > 0)
        .orderBy("id")
    },

    // Worst-case-optimal triangle enumeration (leapfrog_join.rs via
    // HyperCube partitioning — graft.algos.Wcoj): exact triangle SET, not
    // just counts — the id sums checksum every coordinate against the
    // oracle's binary-join enumeration.
    QueryDef(
      "q_wcoj_triangle",
      s"""WITH $DagSql,
        |ue AS (SELECT src AS u, dst AS v FROM dag UNION SELECT dst, src FROM dag),
        |tri AS (SELECT x.u AS a, x.v AS b, y.v AS c
        |        FROM ue x JOIN ue y ON y.u = x.v
        |        JOIN ue z ON z.u = y.v AND z.v = x.u
        |        WHERE x.u < x.v AND x.v < y.v)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(a) AS BIGINT) AS sum_a,
        |       CAST(sum(b) AS BIGINT) AS sum_b,
        |       CAST(sum(c) AS BIGINT) AS sum_c
        |FROM tri
        |ORDER BY n NULLS FIRST""".stripMargin) { (s, dir) =>
      graft.algos.Wcoj.triangles(TpchGraph.partDag(s, dir).edges)
        .agg(count(lit(1)).as("n"), sum(col("a")).as("sum_a"),
          sum(col("b")).as("sum_b"), sum(col("c")).as("sum_c"))
        .orderBy("n")
    },

    // Bounded weighted SSSP (shortest_path.rs:99/:346): Pregel Bellman-Ford,
    // <= 8 hops, weight = (dst % 7) + 1. Oracle enumerates the bounded walk
    // space and takes the min.
    QueryDef(
      "q_sssp",
      """WITH RECURSIVE dag AS (
        |  SELECT a.p_partkey AS src, b.p_partkey AS dst,
        |         (b.p_partkey % 7) + 1.0 AS w
        |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey AND a.p_partkey >= 1
        |  UNION ALL
        |  SELECT a.p_partkey, b.p_partkey, (b.p_partkey % 7) + 1.0
        |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey + 1 AND a.p_partkey >= 1
        |  UNION ALL
        |  SELECT a.p_partkey, b.p_partkey, (b.p_partkey % 7) + 1.0
        |  FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
        |),
        |walk(dst, d, hops) AS (
        |  SELECT dst, w, 1 FROM dag WHERE src = 1 AND dst <= 200
        |  UNION ALL
        |  SELECT g.dst, walk.d + g.w, walk.hops + 1
        |  FROM walk JOIN dag g ON g.src = walk.dst
        |  WHERE walk.hops < 8 AND g.dst <= 200
        |)
        |SELECT dst AS id, round(min(d), 2) AS dist
        |FROM walk GROUP BY dst
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      val base = TpchGraph.partDag(s, dir)
      val weighted = PropertyGraph(base.nodes,
        base.edges.withColumn("weight", (col("dst") % 7 + 1).cast("double")))
      Algos.sssp(s, weighted, source = 1L, maxHops = 8)
        .filter(col("id") =!= 1 && col("id") <= 200)
        .select(col("id"), round(col("dist"), 2).as("dist"))
        .orderBy("id")
    },

    // A* with ALT landmarks (shortest_path.rs:230): exact shortest
    // distances source 1 → targets 40..50 on the weighted part DAG capped
    // at 50 nodes — hash-matches the exhaustive min-over-walks oracle (the
    // DAG is acyclic, so the walk CTE terminates with no hop bound, unlike
    // the Bellman-Ford-bounded q_sssp pair).
    QueryDef(
      "q_astar",
      """WITH RECURSIVE dag AS (
        |  SELECT a.p_partkey AS src, b.p_partkey AS dst, (b.p_partkey % 7) + 1.0 AS w
        |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey AND a.p_partkey >= 1
        |  UNION ALL
        |  SELECT a.p_partkey, b.p_partkey, (b.p_partkey % 7) + 1.0
        |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey + 1 AND a.p_partkey >= 1
        |  UNION ALL
        |  SELECT a.p_partkey, b.p_partkey, (b.p_partkey % 7) + 1.0
        |  FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
        |),
        |capped AS (SELECT src, dst, w FROM dag WHERE src <= 50 AND dst <= 50),
        |walk(dst, d) AS (
        |  SELECT dst, w FROM capped WHERE src = 1
        |  UNION ALL
        |  SELECT g.dst, walk.d + g.w FROM walk JOIN capped g ON g.src = walk.dst
        |)
        |SELECT CAST(dst AS BIGINT) AS id, round(min(d), 2) AS dist
        |FROM walk WHERE dst >= 40 GROUP BY dst
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      val base = TpchGraph.partDag(s, dir)
      val weighted = PropertyGraph(base.nodes,
        base.edges.withColumn("weight", (col("dst") % 7 + 1).cast("double")))
      graft.algos.BoundedAlgos.aStar(s, weighted, col("id") <= 50,
          source = 1L, targets = 40L to 50L)
        .select(col("id"), round(col("dist"), 2).as("dist"))
        .orderBy("id")
    },

    // k-core (structure.rs:282): iterative peeling to the 2-core of a ring
    // (parts 1..150 cyclically chained) with 50 pendant spokes — the pendants
    // peel away, the ring survives, so the 2-core is exactly parts 1..150.
    // AlgosSpec additionally pins kCore semantics on the part DAG.
    QueryDef(
      "q_kcore",
      """SELECT CAST(p_partkey AS BIGINT) AS id FROM part
        |WHERE p_partkey BETWEEN 1 AND 150
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir)
        .select(col("p_partkey").cast("long").as("k"))
        .filter(col("k").between(1, 150))
      def e(src: Column, dst: Column) =
        p.select(src.as("src"), dst.as("dst"), lit("RING").as("rel"), lit(1.0).as("weight"))
      val ring = e(col("k"), when(col("k") === 150, lit(1L)).otherwise(col("k") + 1))
      val spokes = p.filter(col("k") <= 50)
        .select(col("k").as("src"), (col("k") + 10000).as("dst"),
          lit("SPOKE").as("rel"), lit(1.0).as("weight"))
      val nodes = p.select(col("k").as("id"), array(lit("Part")).as("labels"))
      Algos.kCore(PropertyGraph(nodes, ring.unionByName(spokes)), k = 2).orderBy("id")
    },

    // Label propagation (community.rs:39), 4 synchronous rounds on disjoint
    // 5-cliques (part keys are 0..n−1 with 5 | n at every SF). Round 1 every
    // node ties across distinct neighbor labels → adopts its minimum
    // neighbor; round 2 the clique minimum wins by frequency; stable after —
    // label = 5·⌊k/5⌋, a full hash oracle.
    QueryDef(
      "q_label_prop",
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |       CAST((p_partkey // 5) * 5 AS BIGINT) AS label
        |FROM part
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      Algos.labelPropagation(s, cliqueGraph(s, dir), iters = 4)
        .orderBy("id")
    },

    // Local clustering coefficients (clustering.rs:162,199): triangles and
    // distinct-neighbor degrees over the undirected part DAG.
    QueryDef(
      "q_clustering",
      s"""WITH $DagSql,
        |ud AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM dag),
        |deg AS (SELECT v AS id, count(*) AS deg
        |        FROM (SELECT a AS v FROM ud UNION ALL SELECT b FROM ud) GROUP BY v),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM ud e1 JOIN ud e2 ON e2.a = e1.b
        |        JOIN ud e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tcnt AS (SELECT v AS id, count(*) AS t
        |         FROM (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
        |               UNION ALL SELECT z FROM tri) GROUP BY v)
        |SELECT CAST(d.id AS BIGINT) AS id, CAST(d.deg AS BIGINT) AS deg,
        |       CASE WHEN d.deg >= 2
        |            THEN round(coalesce(t, 0) * 2.0 / (d.deg * (d.deg - 1)), 6)
        |            ELSE 0.0 END AS coeff
        |FROM deg d LEFT JOIN tcnt ON tcnt.id = d.id
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      Algos.clusteringCoefficients(s, TpchGraph.partDag(s, dir)).orderBy("id")
    },

    // is_dag (components.rs:352): forward same-brand chains are acyclic,
    // their bidirectional closure is not. Short-diameter fixture — the SCC
    // primitive underneath is diameter-bound (the deep part DAG would make
    // it crawl). The oracle is closed-form; the Spark side genuinely runs
    // the SCC-based check on both graphs.
    QueryDef(
      "q_is_dag",
      """SELECT g, is_dag FROM (VALUES ('cyclic', false), ('dag', true)) t(g, is_dag)
        |ORDER BY g NULLS FIRST""".stripMargin) { (s, dir) =>
      import s.implicits._
      val p = Tables.part(s, dir).select(col("p_partkey").as("k"), col("p_brand").as("brand"))
      val nxt = p.select(col("k").as("k2"), col("brand").as("brand2"))
      // persisted: both derived graphs reference fwd and each SCC pass
      // re-evaluates its input — without the cache the part self-join runs
      // four times per execution
      val fwd = p.join(nxt, col("k2") === col("k") + 1 && col("brand2") === col("brand"))
        .select(col("k").as("src"), col("k2").as("dst"),
          lit("B").as("rel"), lit(1.0).as("weight"))
        .persist()
      val nodes = p.select(col("k").as("id"), array(lit("Part")).as("labels"))
      val dagG = PropertyGraph(nodes, fwd)
      val cyc = PropertyGraph(nodes, fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst"), col("rel"), col("weight"))))
      // isDag is eager (returns Boolean), so the cache is dead once both
      // calls finish — release it here rather than pinning executor storage
      // for the rest of the session across repeated bench iterations
      val res = Seq(("cyclic", Algos.isDag(s, cyc)), ("dag", Algos.isDag(s, dagG)))
      fwd.unpersist()
      res.toDF("g", "is_dag").orderBy("g")
    },

    // DFS preorder (traversal.rs:198) from node 3 over the tree edges only
    // (k → 2k / 2k+1), ascending-neighbor visit order. The oracle ranks each
    // node by its zero-padded root path — lexicographic path order IS
    // preorder on a tree.
    QueryDef(
      "q_dfs",
      """WITH RECURSIVE walk(id, path) AS (
        |  SELECT 3, CAST('' AS VARCHAR)
        |  UNION ALL
        |  SELECT b.p_partkey, w.path || lpad(CAST(b.p_partkey AS VARCHAR), 8, '0')
        |  FROM walk w JOIN part b
        |    ON b.p_partkey = 2*w.id OR b.p_partkey = 2*w.id + 1
        |)
        |SELECT CAST(row_number() OVER (ORDER BY path) AS BIGINT) AS ord,
        |       CAST(id AS BIGINT) AS id
        |FROM walk
        |ORDER BY ord NULLS FIRST""".stripMargin) { (s, dir) =>
      val dag = TpchGraph.partDag(s, dir)
      val tree = PropertyGraph(dag.nodes,
        dag.edges.filter(col("dst") === col("src") * 2 ||
          col("dst") === col("src") * 2 + 1))
      // tree edges have in-degree ≤ 1, so this takes Algos.dfsPreorder's
      // DISTRIBUTED path (preorder = lexicographic root-path sort — no
      // driver materialization, no node bound; the sf10 gate found the
      // 1M-node driver-side bound refusing at 2M nodes). General graphs
      // fall back to the bounded kernel inside the same entry point.
      graft.algos.Algos.dfsPreorder(s, tree, 3L)
        .orderBy("ord")
    },
  )
}
