package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** Link-prediction and node-similarity measures over the undirected simple
  * view of a property graph (reference docs/algorithms/link-prediction.md,
  * docs/algorithms/similarity.md — the reference delegates all of these to
  * its NetworkX adapter, `examples/networkx_integration.py`, which collects
  * the whole graph into one process; graft computes them natively so they
  * stay distributed).
  *
  * Measures (NetworkX-compatible formulas, Γ(x) = distinct undirected
  * neighbors, d(x) = |Γ(x)|):
  *   - common neighbors        cn(u,v)  = |Γ(u) ∩ Γ(v)|
  *   - Jaccard coefficient     cn / |Γ(u) ∪ Γ(v)|
  *   - Adamic–Adar             Σ_{w ∈ Γ(u)∩Γ(v)} 1/ln d(w)
  *   - resource allocation     Σ_{w ∈ Γ(u)∩Γ(v)} 1/d(w)
  *   - preferential attachment d(u)·d(v)
  *   - CCPA (common_neighbor_centrality, α default 0.8):
  *     α·cn + (1−α)·N/dist(u,v) — every scored pair here is non-adjacent
  *     with ≥1 common neighbor, so dist(u,v) = 2 exactly.
  *
  * Candidate set: NetworkX scores a caller-supplied ebunch (typically
  * sampled `nx.non_edges`); a distributed engine instead enumerates the
  * distance-2 frontier — every non-adjacent pair with at least one common
  * neighbor. Pairs outside it score 0 on every neighborhood measure (and
  * only preferential attachment — a degree product needing no join — is
  * nonzero there), so the frontier is the complete support of the four
  * neighborhood measures.
  *
  * Scale shape: one self-join of the adjacency list keyed on the shared
  * neighbor (wedge enumeration — the exchange is reused from the degree
  * attach, which shuffles on the same key), one (u,v)-keyed aggregate, one
  * anti-join against existing edges, two degree joins. Cost is
  * Σ_w d(w)², so a single celebrity hub dominates at scale; wedge centers
  * with d(w) > maxWedgeDegree are excluded (the standard degree cutoff in
  * production link-prediction pipelines). Results are exact whenever no
  * center exceeds the cap.
  */
object LinkPrediction {

  /** Distinct undirected neighbor pairs, both orientations, self-loops
    * dropped: one (node, nbr) row per direction of each simple edge.
    */
  def undirectedAdj(g: PropertyGraph): DataFrame = {
    val ud = g.edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    ud.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(ud.select(col("b").as("node"), col("a").as("nbr")))
  }

  /** All six measures for every candidate pair (u < v). Columns:
    * u, v, cn, jaccard, adamic_adar, resource_alloc, pref_attach, ccpa.
    * Doubles are rounded to 6 dp so summation order cannot leak into
    * results. `nodeCount` feeds CCPA's N term; pass the cached node count
    * (a scalar — computing it here would force an extra job per call).
    */
  def scores(g: PropertyGraph, nodeCount: Long, alpha: Double = 0.8,
      maxWedgeDegree: Int = 1 << 20): DataFrame = {
    // adj feeds FOUR consumers (degree attach, both wedge sides, the
    // anti-join) and deg three — without materialization Spark recomputes
    // the distinct+union edge subtree per consumer (profiled: ~12 parallel
    // recomputes of the same scan at sf0.1). localCheckpoint computes each
    // once and truncates lineage; blocks release via the ContextCleaner.
    val adj = undirectedAdj(g).localCheckpoint()
    val deg = adj.groupBy("node").agg(count(lit(1)).as("deg")).localCheckpoint()

    // Degree of the wedge CENTER, attached before the self-join: keyed on
    // `nbr`, the same key the wedge join shuffles on, so Catalyst reuses the
    // exchange instead of adding a third shuffle.
    val adjW = adj
      .join(deg.select(col("node").as("nbr"), col("deg").as("wdeg")), Seq("nbr"))
      .filter(col("wdeg") <= maxWedgeDegree)

    val wedges = adjW.select(col("nbr").as("w"), col("node").as("u"), col("wdeg"))
      .join(adj.select(col("nbr").as("w"), col("node").as("v")), Seq("w"))
      .filter(col("u") < col("v"))

    // Centers are adjacent to both u and v (u ≠ v), so wdeg ≥ 2 and
    // ln(wdeg) > 0 — Adamic–Adar cannot divide by zero here (NetworkX
    // raises on degree-1 centers only because its ebunch is caller-chosen).
    val pairs = wedges.groupBy("u", "v").agg(
      count(lit(1)).as("cn"),
      sum(lit(1.0) / log(col("wdeg"))).as("aa"),
      sum(lit(1.0) / col("wdeg")).as("ra"))

    val candidates = pairs.join(
      adj.select(col("node").as("u"), col("nbr").as("v")), Seq("u", "v"), "left_anti")

    candidates
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        col("u"), col("v"), col("cn"),
        round(col("cn").cast("double") / (col("du") + col("dv") - col("cn")), 6)
          .as("jaccard"),
        round(col("aa"), 6).as("adamic_adar"),
        round(col("ra"), 6).as("resource_alloc"),
        (col("du") * col("dv")).as("pref_attach"),
        round(lit(alpha) * col("cn") + lit(1.0 - alpha) * lit(nodeCount) / 2.0, 6)
          .as("ccpa"))
  }
}
