package graft.queries

import org.apache.spark.sql.functions._
import graft.algos.{BoundedAlgos, Louvain}
import graft.core.Tables
import graft.graph.PropertyGraph

/** Fourth-wave algorithm coverage: Brandes betweenness (closed-form path
  * oracle on brand chains), Louvain, Kruskal MST, Edmonds-Karp max-flow.
  */
object Algo2QueriesImpl {

  private val DagSql = AlgoQueriesImpl.DagSql

  /** Forward-only same-brand chain graph (k → k+1 when brands match). */
  private def brandChain(s: org.apache.spark.sql.SparkSession, dir: String): PropertyGraph = {
    val p = Tables.part(s, dir).select(col("p_partkey").as("k"), col("p_brand").as("brand"))
    val nxt = p.select(col("k").as("k2"), col("brand").as("brand2"))
    val edges = p.join(nxt, col("k2") === col("k") + 1 && col("brand2") === col("brand"))
      .select(col("k").as("src"), col("k2").as("dst"),
        lit("NEXT").as("rel"), lit(1.0).as("weight"))
    val nodes = p.select(col("k").as("id"), array(lit("Part")).as("labels"))
    PropertyGraph(nodes, edges)
  }

  def defs: Seq[QueryDef] = Seq(

    // Brandes betweenness (centrality.rs:240) on the chain subgraph < 500:
    // a path of length L has betweenness pos·(L−1−pos) — exact closed form.
    QueryDef(
      "q_betweenness",
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |       CAST((rn - 1) * (len - rn) AS DOUBLE) AS betweenness
        |FROM (SELECT p_partkey,
        |             row_number() OVER (PARTITION BY p_brand, p_partkey - rn0 ORDER BY p_partkey) AS rn,
        |             count(*) OVER (PARTITION BY p_brand, p_partkey - rn0) AS len
        |      FROM (SELECT p_partkey, p_brand,
        |                   row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn0
        |            FROM part WHERE p_partkey < 500))
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      BoundedAlgos.betweenness(s, brandChain(s, dir), col("id") < 500, maxNodes = 500)
        .orderBy("id")
    },

    // Articulation points (structure.rs:36) on the chain subgraph < 500 —
    // on a path every interior node is an articulation point.
    QueryDef(
      "q_articulation",
      """SELECT CAST(p_partkey AS BIGINT) AS id
        |FROM (SELECT p_partkey,
        |             row_number() OVER (PARTITION BY p_brand, p_partkey - rn0 ORDER BY p_partkey) AS rn,
        |             count(*) OVER (PARTITION BY p_brand, p_partkey - rn0) AS len
        |      FROM (SELECT p_partkey, p_brand,
        |                   row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn0
        |            FROM part WHERE p_partkey < 500))
        |WHERE rn > 1 AND rn < len
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (aps, _) = BoundedAlgos.articulation(brandChain(s, dir), col("id") < 500,
        maxNodes = 500)
      aps.toSeq.sorted.toDF("id")
    },

    // Bridges (structure.rs:150): every edge of a path is a bridge.
    QueryDef(
      "q_bridges",
      """SELECT CAST(a.p_partkey AS BIGINT) AS s, CAST(b.p_partkey AS BIGINT) AS d
        |FROM part a JOIN part b
        |  ON b.p_partkey = a.p_partkey + 1 AND b.p_brand = a.p_brand
        |WHERE a.p_partkey < 500 AND b.p_partkey < 500
        |ORDER BY s NULLS FIRST""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (_, bridges) = BoundedAlgos.articulation(brandChain(s, dir), col("id") < 500,
        maxNodes = 500)
      bridges.toSeq.sorted.toDF("s", "d").orderBy("s")
    },

    // Louvain phase-1 (community.rs:157) on disjoint 5-cliques: round 1 every
    // node ties on modularity gain across its four singleton neighbors (the
    // arithmetic is bit-identical per candidate) and the lowest-community
    // tie-break picks its minimum neighbor; round 2 the clique minimum
    // dominates w(i→C); round 3 is stable → comm = 5·⌊k/5⌋, a full hash
    // oracle. Algos2Spec still pins planted-clique behavior on mixed graphs.
    QueryDef(
      "q_louvain",
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |       CAST((p_partkey // 5) * 5 AS BIGINT) AS comm
        |FROM part
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      Louvain.run(AlgoQueriesImpl.cliqueGraph(s, dir), maxIters = 5).orderBy("id")
    },

    // Kruskal MST (mst.rs:87) with unique weights w = src·1e5 + dst on the
    // part DAG below 300. Kruskal scans edges in ascending (src, dst); when
    // src = k is reached every node ≤ 2(k-1)+1 is already connected, so the
    // chosen edges are exactly the parent links (1 → 0 via the chain edge,
    // 2,3 → 1, m ≥ 4 → ⌊m/2⌋) — the closed form the oracle enumerates
    // (cross-checked against an independent union-find).
    QueryDef(
      "q_mst",
      """SELECT CAST(CASE WHEN m = 1 THEN 0 WHEN m <= 3 THEN 1 ELSE m // 2 END AS BIGINT) AS src,
        |       CAST(m AS BIGINT) AS dst,
        |       CAST((CASE WHEN m = 1 THEN 0 WHEN m <= 3 THEN 1 ELSE m // 2 END) * 100000 + m AS DOUBLE) AS w
        |FROM (SELECT p_partkey AS m FROM part WHERE p_partkey BETWEEN 1 AND 299)
        |ORDER BY src NULLS FIRST, dst NULLS FIRST""".stripMargin) { (s, dir) =>
      val base = graft.graph.TpchGraph.partDag(s, dir)
      val weighted = base.copy(edges = base.edges
        .withColumn("weight", (col("src") * 100000 + col("dst")).cast("double")))
      BoundedAlgos.mstKruskal(s, weighted, col("id") < 300, maxNodes = 300)
        .orderBy("src", "dst")
    },

    // Edmonds-Karp max-flow (flow.rs:88) from part 1 to part 50, capacities
    // (dst % 7) + 1, subgraph < 100. The fixture is SF-independent (keys
    // 1..99 exist at every SF) and the sink's in-cut is 49→50 (cap 2) +
    // 25→50 (cap 2) = 4, which the source side saturates — verified with an
    // independent BFS augmenting-path implementation.
    QueryDef(
      "q_maxflow",
      "SELECT CAST(4.0 AS DOUBLE) AS maxflow") { (s, dir) =>
      import s.implicits._
      val base = graft.graph.TpchGraph.partDag(s, dir)
      val weighted = base.copy(edges = base.edges
        .withColumn("weight", (col("dst") % 7 + 1).cast("double")))
      val flow = BoundedAlgos.maxFlow(weighted, col("id") < 100,
        source = 1L, sink = 50L, maxNodes = 100)
      Seq(flow).toDF("maxflow")
    },

    // Floyd–Warshall APSP (shortest_path.rs:506) on the weighted part DAG
    // below 60. The oracle's recursive CTE uses UNION (dedup) so its state
    // space is (src, dst, cost) tuples, not walks — bounded, no blow-up.
    QueryDef(
      "q_apsp",
      """WITH RECURSIVE dag AS (
        |  SELECT src, dst, CAST(dst % 7 + 1 AS DOUBLE) AS w FROM (
        |    SELECT a.p_partkey AS src, b.p_partkey AS dst
        |    FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey AND a.p_partkey >= 1
        |    UNION ALL
        |    SELECT a.p_partkey, b.p_partkey
        |    FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey + 1 AND a.p_partkey >= 1
        |    UNION ALL
        |    SELECT a.p_partkey, b.p_partkey
        |    FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
        |  ) WHERE src < 60 AND dst < 60
        |),
        |walk(src, dst, d) AS (
        |  SELECT src, dst, w FROM dag
        |  UNION
        |  SELECT w.src, e.dst, w.d + e.w FROM walk w JOIN dag e ON e.src = w.dst
        |),
        |best AS (SELECT src, dst, min(d) AS dist FROM walk GROUP BY src, dst)
        |SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
        |       round(dist, 6) AS dist
        |FROM best WHERE src <> dst
        |ORDER BY src NULLS FIRST, dst NULLS FIRST""".stripMargin) { (s, dir) =>
      val base = graft.graph.TpchGraph.partDag(s, dir)
      val weighted = base.copy(edges = base.edges
        .withColumn("weight", (col("dst") % 7 + 1).cast("double")))
      BoundedAlgos.floydWarshall(s, weighted, col("id") < 60, maxNodes = 60)
        .select(col("src"), col("dst"), round(col("dist"), 6).as("dist"))
        .orderBy("src", "dst")
    },

    // Prim MST (mst.rs:177) on the identical unique-weight fixture as q_mst:
    // a unique-weight MST is unique, so Prim must reproduce Kruskal's edge
    // set — the same closed-form parent-link oracle.
    QueryDef(
      "q_mst_prim",
      """SELECT CAST(CASE WHEN m = 1 THEN 0 WHEN m <= 3 THEN 1 ELSE m // 2 END AS BIGINT) AS src,
        |       CAST(m AS BIGINT) AS dst,
        |       CAST((CASE WHEN m = 1 THEN 0 WHEN m <= 3 THEN 1 ELSE m // 2 END) * 100000 + m AS DOUBLE) AS w
        |FROM (SELECT p_partkey AS m FROM part WHERE p_partkey BETWEEN 1 AND 299)
        |ORDER BY src NULLS FIRST, dst NULLS FIRST""".stripMargin) { (s, dir) =>
      val base = graft.graph.TpchGraph.partDag(s, dir)
      val weighted = base.copy(edges = base.edges
        .withColumn("weight", (col("src") * 100000 + col("dst")).cast("double")))
      BoundedAlgos.mstPrim(s, weighted, col("id") < 300, maxNodes = 300)
        .orderBy("src", "dst")
    },

    // Min-cost max-flow (flow.rs:254): same capacity fixture as q_maxflow
    // with unit arc costs; maxflow 4 at cost 23 (2 units over the length-5
    // path through 25, then length-6 and length-7 routes through 49) —
    // cross-validated with an independent SPFA implementation.
    QueryDef(
      "q_mincost_flow",
      "SELECT CAST(4.0 AS DOUBLE) AS maxflow, CAST(23.0 AS DOUBLE) AS mincost") { (s, dir) =>
      import s.implicits._
      val base = graft.graph.TpchGraph.partDag(s, dir)
      val weighted = base.copy(edges = base.edges
        .withColumn("weight", (col("dst") % 7 + 1).cast("double")))
      val (flow, cst) = BoundedAlgos.minCostMaxFlow(weighted, col("id") < 100,
        source = 1L, sink = 50L, costOf = (_, _) => 1.0, maxNodes = 100)
      Seq((flow, cst)).toDF("maxflow", "mincost")
    },

    // Link prediction (docs/algorithms/link-prediction.md — the reference
    // delegates to NetworkX; graft.algos.LinkPrediction computes all six
    // measures natively over the d=2 frontier). Top-100 by common-neighbor
    // count with an integer total order, so no float enters the cut.
    QueryDef(
      "q_link_pred",
      s"""WITH $DagSql,
        |ud AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |       FROM dag WHERE src <> dst),
        |adj AS (SELECT a AS node, b AS nbr FROM ud UNION ALL SELECT b, a FROM ud),
        |deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
        |wedge AS (SELECT l.node AS u, r.node AS v, l.nbr AS w
        |          FROM adj l JOIN adj r ON r.nbr = l.nbr AND l.node < r.node),
        |pairs AS (SELECT u, v, count(*) AS cn,
        |                 sum(1.0/ln(dw.d)) AS aa, sum(1.0/dw.d) AS ra
        |          FROM wedge JOIN deg dw ON dw.node = wedge.w GROUP BY u, v),
        |cand AS (SELECT p.u, p.v, p.cn, p.aa, p.ra FROM pairs p
        |         WHERE NOT EXISTS (SELECT 1 FROM ud e WHERE e.a = p.u AND e.b = p.v)),
        |nn AS (SELECT count(*) AS n FROM part)
        |SELECT CAST(c.u AS BIGINT) AS u, CAST(c.v AS BIGINT) AS v,
        |       CAST(c.cn AS BIGINT) AS cn,
        |       round(c.cn * 1.0 / (du.d + dv.d - c.cn), 6) AS jaccard,
        |       round(c.aa, 6) AS adamic_adar,
        |       round(c.ra, 6) AS resource_alloc,
        |       CAST(du.d * dv.d AS BIGINT) AS pref_attach,
        |       round(0.8 * c.cn + 0.2 * nn.n / 2.0, 6) AS ccpa
        |FROM cand c JOIN deg du ON du.node = c.u JOIN deg dv ON dv.node = c.v
        |CROSS JOIN nn
        |ORDER BY cn DESC, u NULLS FIRST, v NULLS FIRST
        |LIMIT 100""".stripMargin) { (s, dir) =>
      val g = graft.graph.TpchGraph.partDag(s, dir)
      graft.algos.LinkPrediction.scores(g, nodeCount = g.nodes.count())
        .orderBy(col("cn").desc, col("u"), col("v"))
        .limit(100)
    },

    // Whole-graph summary (examples/networkx_integration.py: density,
    // transitivity, diameter, average shortest-path length) on the
    // undirected part DAG <= 80 — diameter/avg-path are APSP reductions,
    // run on the bounded subgraph like the reference's NetworkX round-trip;
    // density and transitivity come from distributed aggregates.
    QueryDef(
      "q_graph_stats",
      """WITH RECURSIVE dag AS (
        |  SELECT src, dst FROM (
        |    SELECT a.p_partkey AS src, b.p_partkey AS dst
        |    FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey AND a.p_partkey >= 1
        |    UNION ALL
        |    SELECT a.p_partkey, b.p_partkey
        |    FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey + 1 AND a.p_partkey >= 1
        |    UNION ALL
        |    SELECT a.p_partkey, b.p_partkey
        |    FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
        |  ) WHERE src <= 80 AND dst <= 80
        |),
        |ud AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |       FROM dag WHERE src <> dst),
        |adj AS (SELECT a AS node, b AS nbr FROM ud UNION ALL SELECT b, a FROM ud),
        |deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
        |tri AS (SELECT e1.a AS x FROM ud e1 JOIN ud e2 ON e2.a = e1.b
        |        JOIN ud e3 ON e3.a = e1.a AND e3.b = e2.b),
        |walk(src, dst, dd) AS (
        |  SELECT node, nbr, 1 FROM adj
        |  UNION
        |  SELECT w.src, a.nbr, w.dd + 1 FROM walk w JOIN adj a ON a.node = w.dst
        |  WHERE w.dd < 31
        |),
        |best AS (SELECT src, dst, min(dd) AS dist FROM walk WHERE src <> dst
        |         GROUP BY src, dst),
        |agg AS (SELECT (SELECT count(*) FROM part WHERE p_partkey <= 80) AS n,
        |               (SELECT count(*) FROM ud) AS m,
        |               (SELECT 3.0 * count(*) FROM tri) AS tri3,
        |               (SELECT sum(d * (d - 1)) / 2.0 FROM deg) AS wedges,
        |               (SELECT max(dist) FROM best) AS diam,
        |               (SELECT avg(dist) FROM best) AS avgp)
        |SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
        |       round(2.0 * m / (n * (n - 1.0)), 6) AS density,
        |       round(tri3 / wedges, 6) AS transitivity,
        |       CAST(diam AS BIGINT) AS diameter,
        |       round(avgp, 6) AS avg_path
        |FROM agg
        |ORDER BY n NULLS FIRST""".stripMargin) { (s, dir) =>
      val base = graft.graph.TpchGraph.partDagCapped(s, dir, 80)
      val sym = base.copy(edges = base.edges
        .select(col("src"), col("dst"), col("rel"), lit(1.0).as("weight"))
        .unionByName(base.edges.select(col("dst").as("src"),
          col("src").as("dst"), col("rel"), lit(1.0).as("weight"))))
      val dists = BoundedAlgos.floydWarshall(s, sym, lit(true), maxNodes = 100)
      val adj = graft.algos.LinkPrediction.undirectedAdj(base)
      // four 1-row frames combined — each crossJoin is a broadcast of one row
      val nRow = base.nodes.agg(count(lit(1)).as("n"))
      val mRow = adj.agg((count(lit(1)) / 2).cast("long").as("m"))
      val gc = graft.algos.Algos.globalClustering(s, base)
      val dRow = dists.agg(max(col("dist")).cast("long").as("diameter"),
        round(avg(col("dist")), 6).as("avg_path"))
      nRow.crossJoin(mRow).crossJoin(gc).crossJoin(dRow)
        .select(col("n"), col("m"),
          round(lit(2.0) * col("m") / (col("n") * (col("n") - lit(1.0))), 6)
            .as("density"),
          col("global_coeff").as("transitivity"),
          col("diameter"), col("avg_path"))
        .orderBy("n")
    },
  )
}
