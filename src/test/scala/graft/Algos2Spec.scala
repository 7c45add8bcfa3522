package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.algos.{BoundedAlgos, Louvain}
import graft.graph.PropertyGraph

class Algos2Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mkGraph(edges: Seq[(Long, Long)], w: Long => Double = _ => 1.0): PropertyGraph = {
    val e = edges.zipWithIndex.map { case ((s, d), i) => (s, d, w(i)) }
      .toDF("src", "dst", "weight").withColumn("rel", lit("E"))
    val n = edges.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
      .withColumn("labels", array(lit("N")))
    PropertyGraph(n, e)
  }

  test("louvain separates two cliques joined by one edge") {
    val cliqueA = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cliqueB = for (a <- 11L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val g = mkGraph(cliqueA ++ cliqueB ++ Seq((4L, 11L)))
    val comm = Louvain.run(g, maxIters = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).map(comm).toSet.size == 1, s"clique A split: $comm")
    assert((11L to 14L).map(comm).toSet.size == 1, s"clique B split: $comm")
    assert(comm(1L) != comm(11L), s"cliques merged: $comm")
  }

  test("brandes betweenness on a path graph") {
    // 1-2-3-4-5: exact betweenness = 0, 3, 4, 3, 0
    val g = mkGraph(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val bc = BoundedAlgos.betweenness(spark, g, lit(true)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bc(1L) == 0.0 && bc(5L) == 0.0)
    assert(bc(2L) == 3.0 && bc(4L) == 3.0)
    assert(bc(3L) == 4.0)
  }

  test("kruskal picks the light edges") {
    // triangle with one heavy edge → MST drops it
    val g = mkGraph(Seq((1L, 2L), (2L, 3L), (1L, 3L)),
      w = i => if (i == 2) 10.0 else 1.0)
    val mst = BoundedAlgos.mstKruskal(spark, g, lit(true)).collect()
    assert(mst.length == 2)
    assert(mst.map(_.getDouble(2)).sum == 2.0)
  }

  test("max-flow on the classic two-path network") {
    // s(1) → 2 → t(4), s → 3 → t, each capacity 1 → flow 2
    val g = mkGraph(Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L)))
    assert(BoundedAlgos.maxFlow(g, lit(true), 1L, 4L) == 2.0)
  }

  test("A* with ALT landmarks matches Dijkstra and settles fewer nodes") {
    // weighted grid-ish chain with shortcuts: 1..60 chain (weight 2) plus
    // doubling shortcuts k→2k (weight 3) — long graph, far target, the
    // shape where a goal-directed heuristic prunes most of the frontier
    val chain = (1L until 60L).map(k => (k, k + 1))
    val jumps = (1L to 30L).map(k => (k, 2 * k))
    val edges = chain ++ jumps
    val g = mkGraph(edges, w = i => if (i < chain.length) 2.0 else 3.0)
    val dij = BoundedAlgos.aStar(spark, g, lit(true), 1L, Seq(57L),
        numLandmarks = 0).collect().head
    val alt = BoundedAlgos.aStar(spark, g, lit(true), 1L, Seq(57L),
        numLandmarks = 4).collect().head
    assert(alt.getDouble(1) == dij.getDouble(1)) // identical optimal distance
    assert(alt.getInt(2) < dij.getInt(2),        // strictly fewer settled
      s"ALT settled ${alt.getInt(2)} vs Dijkstra ${dij.getInt(2)}")
    // unreachable targets yield no row
    assert(BoundedAlgos.aStar(spark, g, lit(true), 57L, Seq(1L),
      numLandmarks = 2).collect().isEmpty)
  }

  test("bounded algos refuse oversized subgraphs") {
    val g = mkGraph((1L to 50L).map(i => (i, i + 1)))
    assertThrows[IllegalArgumentException](
      BoundedAlgos.betweenness(spark, g, lit(true), maxNodes = 10))
  }
}

class ArticulationSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def mkGraph(edges: Seq[(Long, Long)],
      w: Long => Double = _ => 1.0): PropertyGraph = {
    val e = edges.zipWithIndex.map { case ((s, d), i) => (s, d, w(i)) }
      .toDF("src", "dst", "weight").withColumn("rel", lit("E"))
    val n = edges.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
      .withColumn("labels", array(lit("N")))
    PropertyGraph(n, e)
  }

  test("betweenness ignores reciprocal duplicates of an undirected edge") {
    // diamond 1-{2,3}-4: sigma(1→4) = 2 split evenly, bc(2) = bc(3) = 1.
    // storing the 1-2 relation as BOTH directed edges must not double
    // node 2's path count (the undirected simple view collapses them)
    val g = mkGraph(Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 4L), (3L, 4L)))
    val bc = graft.algos.BoundedAlgos.betweenness(spark, g, lit(true))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bc(2L) == bc(3L), s"reciprocal edge skewed the split: $bc")
  }

  test("min-cost flow prices antiparallel edges independently") {
    // source 1 → sink 2 directly (cap 1, cost 5) and via 3 (cap 1, cost
    // 1+1); edge (2,1) exists with cost 9 — under the old (u,v)-keyed cost
    // map it clobbered the residual of (1,2), corrupting prices
    val g = mkGraph(Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 2L)),
      w = _ => 1.0)
    val costs = Map((1L, 2L) -> 5.0, (2L, 1L) -> 9.0,
      (1L, 3L) -> 1.0, (3L, 2L) -> 1.0)
    val (flow, cost) = graft.algos.BoundedAlgos.minCostMaxFlow(
      g, lit(true), 1L, 2L, (s, d) => costs((s, d)))
    assert(flow == 2.0, s"flow $flow")
    assert(cost == 7.0, s"cheap path first (2) then direct (5): got $cost")
  }

  test("articulation handles node id -1 (no parent-sentinel collision)") {
    // path  -1 — 7 — 8: node 7 is the cut vertex; with the old -1L parent
    // sentinel, 7 (whose DFS parent can be node -1) took the root rule
    // and was missed
    val g = mkGraph(Seq((-1L, 7L), (7L, 8L)))
    val (aps, bridges) = graft.algos.BoundedAlgos.articulation(g, lit(true))
    assert(aps == Set(7L), s"aps $aps")
    assert(bridges == Set((-1L, 7L), (7L, 8L)))
  }

  test("articulation points and bridges on a barbell graph") {
    // triangle 1-2-3 + bridge 3-4 + triangle 4-5-6
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L))
    val e = edges.toDF("src", "dst").withColumn("rel", lit("E")).withColumn("weight", lit(1.0))
    val n = edges.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
      .withColumn("labels", array(lit("N")))
    val (aps, bridges) = graft.algos.BoundedAlgos.articulation(
      graft.graph.PropertyGraph(n, e), lit(true))
    assert(aps == Set(3L, 4L))
    assert(bridges == Set((3L, 4L)))
  }
}
