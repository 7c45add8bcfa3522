package graft.algos

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** The reference's `db.algorithms()` facade (docs/algorithms/index.md:78),
  * re-expressed over Spark: every method is a thin delegation to the
  * distributed implementations in `graft.algos.*` — the facade adds no
  * logic, it exists so a user of the reference finds the same algorithm
  * surface in one place (`session.algorithms.pageRank()` ≈
  * `db.algorithms().pagerank()`).
  *
  * Driver-bounded algorithms (Brandes betweenness, Floyd–Warshall APSP,
  * flows, MST) take the same `nodeFilter`/`maxNodes` contract as
  * `BoundedAlgos`: they refuse, loudly, beyond the bound instead of
  * collecting a corpus-scale graph.
  */
final class GraphAlgorithms(spark: SparkSession, g: PropertyGraph) {

  // ---- metrics (docs/algorithms/metrics.md) ----
  def nodeCount(): Long = g.nodes.count()
  def edgeCount(): Long = g.edges.count()
  def transitivity(): DataFrame = Algos.globalClustering(spark, g)
  def triangles(): DataFrame = Algos.triangleCounts(spark, g)
  def clustering(): DataFrame = Algos.clusteringCoefficients(spark, g)

  // ---- centrality (docs/algorithms/centrality.md) ----
  def pageRank(iters: Int = 20, damping: Double = 0.85): DataFrame =
    Algos.pageRankDF(g, iters, damping)
  /** Undirected simple degree per node — RAW counts (the reference's
    * degree output), one row per node INCLUDING isolated nodes (degree 0),
    * like every other per-node frame this facade returns. NetworkX's
    * normalized `degree_centrality` is `degree / (nodeCount() - 1)` on top
    * of this.
    */
  def degreeCentrality(): DataFrame = {
    val adj = LinkPrediction.undirectedAdj(g)
    val deg = adj.groupBy(col("node").as("id"))
      .agg(count(lit(1)).as("degree"))
    // one row per node: isolated nodes get an explicit 0, and endpoints of
    // dangling edges (no node row — validate() audits but does not forbid
    // them) keep their degree row instead of silently vanishing
    g.nodes.select(col("id")).unionByName(adj.select(col("node").as("id")))
      .distinct().join(deg, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("degree"), lit(0L)).as("degree"))
  }
  def eigenvectorCentrality(iters: Int = 4): DataFrame =
    Algos.eigenvectorCentrality(g, iters)
  def betweennessCentrality(nodeFilter: Column = lit(true),
      maxNodes: Int = 500): DataFrame =
    BoundedAlgos.betweenness(spark, g, nodeFilter, maxNodes)
  def closenessCentrality(sources: DataFrame, srcCol: String,
      rels: Seq[String] = Seq.empty, maxDepth: Int = 10): DataFrame =
    Algos.boundedCloseness(g, sources, srcCol, rels, maxDepth)

  // ---- components & community (docs/algorithms/community.md) ----
  def connectedComponents(): DataFrame = Algos.connectedComponents(spark, g)
  def weaklyConnectedComponents(): DataFrame = connectedComponents()
  def stronglyConnectedComponents(): DataFrame =
    Algos.stronglyConnectedComponents(spark, g)
  def labelPropagation(iters: Int = 5): DataFrame =
    Algos.labelPropagation(spark, g, iters)
  def louvain(maxIters: Int = 10): DataFrame = Louvain.run(g, maxIters)
  def kCore(k: Int): DataFrame = Algos.kCore(g, k)

  // ---- path finding (docs/algorithms/path-finding.md) ----
  def dijkstra(source: Long): DataFrame =
    Algos.ssspConverged(spark, g, source)
  def allPairsShortestPath(nodeFilter: Column = lit(true),
      maxNodes: Int = 500): DataFrame =
    BoundedAlgos.floydWarshall(spark, g, nodeFilter, maxNodes)
  def dfs(start: Long): DataFrame = Algos.dfsPreorder(spark, g, start)
  def topologicalLevels(): DataFrame = Algos.topoLevels(g)
  def isDag(): Boolean = Algos.isDag(spark, g)

  // ---- link prediction & similarity (docs/algorithms/link-prediction.md,
  //      similarity.md — native, not a NetworkX round-trip) ----
  def linkPrediction(maxWedgeDegree: Int = 1 << 20): DataFrame =
    LinkPrediction.scores(g, nodeCount(), maxWedgeDegree = maxWedgeDegree)

  // ---- interchange (examples/networkx_integration.py escape hatch) ----
  def exportEdgeList(path: String): Unit =
    graft.sources.GraphIO.exportEdgeList(g, path)
  def toNodeLinkJson(maxNodes: Int = 100000): String =
    graft.sources.GraphIO.toNodeLinkJson(g, maxNodes)
}
