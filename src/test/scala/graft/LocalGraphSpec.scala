package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.algos.Algos
import graft.frontends.sparql.SparqlFrontend
import graft.graph.{LocalGraph, PropertyGraph, TpchRdf}

/** The adaptive single-stage strategies (LocalGraph) must be RESULT-identical
  * to the distributed frontier loops they replace — at test scale every graph
  * fits under the broadcast threshold, so without forcing the threshold to 0
  * the distributed paths would go untested entirely.
  */
class LocalGraphSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mkGraph(edges: Seq[(Long, Long)]): PropertyGraph = {
    val e = edges.toDF("src", "dst")
      .withColumn("rel", lit("E")).withColumn("weight", lit(1.0))
    val n = edges.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
      .withColumn("labels", array(lit("N")))
    PropertyGraph(n, e)
  }

  /** Run `body` once with the local path forced off (threshold 0 → the
    * distributed loop) and once with it on, returning both results.
    */
  private def bothStrategies[A](body: => A): (A, A) = {
    spark.conf.set(LocalGraph.MaxEdgesKey, "0")
    val distributed = try body finally spark.conf.unset(LocalGraph.MaxEdgesKey)
    (distributed, body)
  }

  // diamond + tail + a disconnected pair: multiple shortest paths, uneven depths
  private val edges = Seq(
    (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (5L, 6L),
    (7L, 8L))

  test("bfs: local and distributed paths agree exactly") {
    val g = mkGraph(edges)
    val seeds = Seq(1L, 7L).toDF("id")
    val (dist, local) = bothStrategies {
      g.bfs(seeds, "id", Nil, maxDepth = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    assert(dist == local)
    assert(local.contains((1L, 4L, 2)) && local.contains((1L, 6L, 4)))
    assert(local.contains((7L, 8L, 1)) && !local.exists(t => t._1 == 7L && t._2 == 5L))
  }

  test("bfs: node filter folds identically on both paths") {
    val g = mkGraph(edges)
    val seeds = Seq(1L).toDF("id")
    val (dist, local) = bothStrategies {
      g.bfs(seeds, "id", Nil, maxDepth = 10,
          filterNodes = Some(col("__node") =!= 3L))
        .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    }
    assert(dist == local)
    assert(!local.exists(_._1 == 3L))
    assert(local.contains((4L, 2L.toInt))) // still reachable via 2
  }

  test("bfsPaths: local and distributed paths agree exactly (single + all)") {
    // diamond (two minimal routes 1→2→4, 1→3→4) + a cycle back 4→1 + tail
    val g = mkGraph(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 1L), (4L, 5L)))
    val seeds = Seq(1L).toDF("id")
    val (distOne, localOne) = bothStrategies {
      g.bfsPaths(seeds, "id", Nil, maxDepth = 10, all = false)
        .collect().map(r => (r.getLong(1), r.getInt(2), r.getSeq[Long](3))).toSet
    }
    assert(distOne == localOne)
    // one lexicographically-min path per endpoint; cycle edge adds nothing
    assert(localOne == Set(
      (2L, 1, Seq(1L, 2L)), (3L, 1, Seq(1L, 3L)),
      (4L, 2, Seq(1L, 2L, 4L)), (5L, 3, Seq(1L, 2L, 4L, 5L))))
    val (distAll, localAll) = bothStrategies {
      g.bfsPaths(seeds, "id", Nil, maxDepth = 10, all = true)
        .collect().map(r => (r.getLong(1), r.getInt(2), r.getSeq[Long](3))).toSet
    }
    assert(distAll == localAll)
    // every minimal path: both diamond routes to 4 and both extensions to 5
    assert(localAll == Set(
      (2L, 1, Seq(1L, 2L)), (3L, 1, Seq(1L, 3L)),
      (4L, 2, Seq(1L, 2L, 4L)), (4L, 2, Seq(1L, 3L, 4L)),
      (5L, 3, Seq(1L, 2L, 4L, 5L)), (5L, 3, Seq(1L, 3L, 4L, 5L))))
  }

  test("topoLevels: local and distributed paths agree exactly") {
    val g = mkGraph(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L)))
    val (dist, local) = bothStrategies {
      Algos.topoLevels(g).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    assert(dist == local)
    assert(local == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3))
  }

  test("topoLevels: deep chains cross the fold boundary, cycles terminate") {
    // 20-deep chain: the distributed loop folds its proposal buffer every 8
    // rounds — levels must be exact across fold boundaries on both branches
    val chain = mkGraph((1L until 21L).map(i => (i, i + 1)))
    val (dist, local) = bothStrategies {
      Algos.topoLevels(chain).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    assert(dist == local)
    assert(local == (1L to 21L).map(i => i -> (i - 1).toInt).toMap)
    // cyclic input: frontier never drains; maxIters must terminate the loop
    // with bounded state (the fold keeps ≤ foldEvery frames pinned) and
    // every node graded ≤ maxIters on both branches
    val cyc = mkGraph(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    val (dc, lc) = bothStrategies {
      Algos.topoLevels(cyc, maxIters = 12).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    assert(dc.keySet == Set(1L, 2L, 3L, 4L) && lc.keySet == dc.keySet)
    assert(dc.values.forall(_ <= 12) && lc.values.forall(_ <= 12))
    // with checkConvergence the same truncation THROWS on both branches —
    // the exact acyclicity witness isDag's at-scale confirm relies on
    val (de, le) = bothStrategies {
      intercept[IllegalStateException](
        Algos.topoLevels(cyc, maxIters = 12, checkConvergence = true)
          .collect())
    }
    assert(de.getMessage.contains("did not converge") &&
      le.getMessage.contains("did not converge"))
  }

  test("scc: local and distributed paths agree exactly") {
    // 3-cycle, 2-cycle, and a bridge singleton
    val g = mkGraph(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 6L), (6L, 5L)))
    val (dist, local) = bothStrategies {
      Algos.stronglyConnectedComponents(spark, g).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(dist == local)
    assert(local(1L) == local(2L) && local(2L) == local(3L))
    assert(local(5L) == local(6L) && local(4L) == 4L)
  }

  test("sparql + closure: local and distributed paths agree exactly") {
    val g = TpchRdf.withPaths(spark, sf)
    val q = "SELECT ?d WHERE { pt:1 child+ ?d } ORDER BY ?d"
    val (dist, local) = bothStrategies {
      SparqlFrontend.run(g, q).collect().map(_.getString(0)).toSeq
    }
    assert(dist == local && local.nonEmpty)
  }

  test("pageRank: local and distributed paths agree after rounding") {
    val g = mkGraph(edges)
    val (dist, local) = bothStrategies {
      Algos.pageRankDF(g, iters = 3).collect()
        .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 1e6)).toMap
    }
    assert(dist == local)
    assert(local.size == 8)
    // 4 receives from both 2 and 3; 7 is a pure source at the floor rank
    assert(local(4L) > local(7L))
  }

  test("labelPropagation: local and distributed paths agree exactly") {
    val g = mkGraph(edges)
    val (dist, local) = bothStrategies {
      Algos.labelPropagation(spark, g, iters = 5).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(dist == local)
    assert(local.size == 8)
  }

  test("sssp: local and distributed paths agree exactly") {
    val g = mkGraph(edges)
    val (dist, local) = bothStrategies {
      Algos.sssp(spark, g, source = 1L, maxHops = 8).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(dist == local)
    assert(local(6L) == 4.0 && !local.contains(8L))
  }

  test("louvain: local and distributed paths agree exactly") {
    // two disjoint 5-cliques: synchronous Louvain provably converges to the
    // min-member community within 3 rounds (the q_louvain fixture shape;
    // integer weights keep every sum exact in doubles)
    def clique(ids: Seq[Long]) =
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val g = mkGraph(clique(1L to 5L) ++ clique(11L to 15L))
    val (dist, local) = bothStrategies {
      graft.algos.Louvain.run(g).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(dist == local)
    assert((1L to 5L).map(local).toSet.size == 1)
    assert((11L to 15L).map(local).toSet.size == 1)
    assert(local(1L) != local(11L))
  }

  test("simplePaths: local and distributed paths agree exactly") {
    // cycle 1-2-3-1 plus tail 3-4: exercises the visited guard both ways
    val g = mkGraph(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    val seeds = Seq(1L, 2L).toDF("id")
    val (dist, local) = bothStrategies {
      g.varLengthExpandPaths(seeds, "id", Nil, minHops = 1, maxHops = -1)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getSeq[Long](3)))
        .toSet
    }
    assert(dist == local)
    // from 1: 1-2, 1-2-3, 1-2-3-4 (1-2-3-1 pruned by the guard)
    assert(local.filter(_._1 == 1L).map(t => (t._2, t._4)) == Set(
      (2L, Seq(1L, 2L)), (3L, Seq(1L, 2L, 3L)), (4L, Seq(1L, 2L, 3L, 4L))))
  }

  test("edge-unique walks: local and distributed paths agree exactly") {
    // cycle 1-2-3-1 plus tail 3-4: an edge-unique walk returns to 1 over
    // the closing edge (node repeat allowed) but can never reuse an edge
    val g = mkGraph(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    val seeds = Seq(1L).toDF("id")
    val (dist, local) = bothStrategies {
      g.varLengthExpandPaths(seeds, "id", Nil, minHops = 1, maxHops = -1,
          edgeUnique = true)
        .collect()
        .map(r => (r.getLong(1), r.getInt(2), r.getSeq[Long](3)))
        .toSet
    }
    assert(dist == local)
    assert(local == Set(
      (2L, 1, Seq(1L, 2L)), (3L, 2, Seq(1L, 2L, 3L)),
      (1L, 3, Seq(1L, 2L, 3L, 1L)), // node 1 revisited over the unused edge
      (4L, 3, Seq(1L, 2L, 3L, 4L)))) // stops at 1: edge 1→2 already used
  }

  test("atMost probes without scanning past the limit") {
    val big = spark.range(1000000).toDF("id")
    assert(LocalGraph.atMost(big, 1000000L))
    assert(!LocalGraph.atMost(big, 999999L))
    assert(LocalGraph.atMost(spark.emptyDataFrame, 0L))
  }
}
