package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.algos.LinkPrediction
import graft.graph.PropertyGraph

/** LinkPrediction.scores against hand-computed NetworkX formulas on a
  * five-node fixture: triangle 1-2-3 plus tail 3-4-5.
  *
  *   Γ(1)={2,3} Γ(2)={1,3} Γ(3)={1,2,4} Γ(4)={3,5} Γ(5)={4}
  *
  * Candidate (non-adjacent, ≥1 common neighbor) pairs: (1,4) and (2,4)
  * through center 3, (3,5) through center 4.
  */
class LinkPredictionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def fixture: PropertyGraph = {
    // edge direction and duplicates must not matter: 2->1 is reversed,
    // 3-4 appears twice (once per direction)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 3L), (4L, 5L))
      .toDF("src", "dst")
      .select(col("src"), col("dst"), lit("L").as("rel"), lit(1.0).as("weight"))
    val nodes = (1L to 5L).toDF("id")
      .select(col("id"), array(lit("N")).as("labels"))
    PropertyGraph(nodes, edges)
  }

  test("scores match NetworkX formulas on the hand-computed fixture") {
    val out = LinkPrediction.scores(fixture, nodeCount = 5L)
      .orderBy("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.toSeq == Seq(
      // (1,4): center 3 (deg 3); jaccard 1/(2+2-1); ccpa .8*1+.2*5/2
      (1L, 4L, 1L, r6(1.0 / 3), r6(1 / math.log(3)), r6(1.0 / 3), 4L, 1.3),
      (2L, 4L, 1L, r6(1.0 / 3), r6(1 / math.log(3)), r6(1.0 / 3), 4L, 1.3),
      // (3,5): center 4 (deg 2); jaccard 1/(3+1-1)
      (3L, 5L, 1L, r6(1.0 / 3), r6(1 / math.log(2)), 0.5, 3L, 1.3)))
  }

  test("maxWedgeDegree excludes hub centers but keeps the rest exact") {
    val out = LinkPrediction.scores(fixture, nodeCount = 5L, maxWedgeDegree = 2)
      .select("u", "v").as[(Long, Long)].collect().toSet
    // center 3 (deg 3) is over the cap -> (1,4) and (2,4) drop; (3,5) stays
    assert(out == Set((3L, 5L)))
  }

  test("eigenvector centrality matches the hand-run integer power iteration") {
    // x0=1; x1=deg=(2,2,3,2,1); x2=(5,5,6,4,2); x3=(11,11,14,8,4);
    // x4=(25,25,30,18,8); norm=sqrt(2538)
    val expectedX4 = Seq(25L, 25L, 30L, 18L, 8L)
    val norm = math.sqrt(expectedX4.map(x => x * x).sum.toDouble)
    val expected = expectedX4.map(x => math.rint(x / norm * 1e6) / 1e6)
    val out = graft.algos.Algos.eigenvectorCentrality(fixture, iters = 4)
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(out == expected)
    // the triangle's highest-degree member dominates; the tail end trails
    assert(out(2) == out.max && out(4) == out.min)
    // distributed branch (forced via the maxEdges gate) is bit-identical
    spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, "0")
    try {
      val dist = graft.algos.Algos.eigenvectorCentrality(fixture, iters = 4)
        .orderBy("id").collect().map(_.getDouble(1)).toSeq
      assert(dist == expected)
    } finally spark.conf.unset(graft.graph.LocalGraph.MaxEdgesKey)
  }

  test("eigenvector centrality refuses when dmax^iters would wrap a long") {
    // star hub of degree 3 over 62 iterations: 3^62 > 2^62 — the integer
    // recursion would overflow silently; the guard must throw instead
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
      .select(col("src"), col("dst"), lit("L").as("rel"), lit(1.0).as("weight"))
    val star = PropertyGraph((0L to 3L).toDF("id"), edges)
    val e = intercept[IllegalArgumentException] {
      graft.algos.Algos.eigenvectorCentrality(star, iters = 62)
    }
    assert(e.getMessage.contains("exact-integer range"))
    // distributed branch refuses identically
    spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, "0")
    try {
      val ed = intercept[IllegalArgumentException] {
        graft.algos.Algos.eigenvectorCentrality(star, iters = 62)
      }
      assert(ed.getMessage.contains("exact-integer range"))
    } finally spark.conf.unset(graft.graph.LocalGraph.MaxEdgesKey)
    // the same hub at 4 iterations (3^4 = 81) is comfortably exact
    assert(graft.algos.Algos.eigenvectorCentrality(star, iters = 4)
      .count() == 4L)
  }

  test("eigenvector: dangling endpoints score identically local vs distributed") {
    // edge (3,9) points at a vertex ABSENT from the node table — permitted
    // (degreeCentrality documents dangling endpoints). Walk counts must not
    // accumulate on or flow through the dangling vertex: the distributed
    // branch re-restricts x to node ids per iteration, and the local branch
    // guards its merge with the node set — so both equal the same graph
    // WITHOUT the dangling edge (x(9)=0 always; 9 is never output).
    def g(extra: Seq[(Long, Long)]) = {
      val edges = (Seq((1L, 2L), (2L, 3L), (3L, 1L)) ++ extra).toDF("src", "dst")
        .select(col("src"), col("dst"), lit("L").as("rel"), lit(1.0).as("weight"))
      PropertyGraph((1L to 3L).toDF("id"), edges)
    }
    def scores(gr: PropertyGraph) = graft.algos.Algos
      .eigenvectorCentrality(gr, iters = 4)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val clean = scores(g(Seq.empty))
    val local = scores(g(Seq((3L, 9L))))
    assert(local == clean, "dangling edge must not perturb local scores")
    spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, "0")
    try {
      val dist = scores(g(Seq((3L, 9L))))
      assert(dist == clean, "dangling edge must not perturb distributed scores")
    } finally spark.conf.unset(graft.graph.LocalGraph.MaxEdgesKey)
  }

  test("eigenvector: distributed L2 norm squares in doubles (no long overflow)") {
    // clique of 6: x_t = 5^t for every vertex. iters=26 keeps x = 5^26 ~
    // 1.49e18 inside the dmax^iters <= 2^62 guard, but x*x in LONG
    // arithmetic would overflow by ~2^60 — the norm must square in doubles
    // (both branches), yielding 1/sqrt(6) everywhere.
    val edges = (0L to 5L).flatMap(a => (0L to 5L).filter(_ != a).map((a, _)))
      .toDF("src", "dst")
      .select(col("src"), col("dst"), lit("L").as("rel"), lit(1.0).as("weight"))
    val clique = PropertyGraph((0L to 5L).toDF("id"), edges)
    val expected = math.rint(1.0 / math.sqrt(6.0) * 1e6) / 1e6
    def run() = graft.algos.Algos.eigenvectorCentrality(clique, iters = 26)
      .collect().map(_.getDouble(1)).toSeq
    assert(run() == Seq.fill(6)(expected))
    spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, "0")
    try assert(run() == Seq.fill(6)(expected))
    finally spark.conf.unset(graft.graph.LocalGraph.MaxEdgesKey)
  }

  test("algorithms facade delegates over the session graph") {
    val sess = new GraftSession(spark, fixture)
    assert(sess.algorithms.nodeCount() == 5L)
    assert(sess.algorithms.edgeCount() == 6L)
    val deg = sess.algorithms.degreeCentrality().orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(deg == Seq((1L, 2L), (2L, 2L), (3L, 3L), (4L, 2L), (5L, 1L)))
    // isolated nodes carry an explicit degree-0 row (one row per node,
    // like every other per-node facade frame)
    val withIsolated = new GraftSession(spark,
      fixture.copy(nodes = fixture.nodes.unionByName(
        Seq(9L).toDF("id"), allowMissingColumns = true)))
    val deg9 = withIsolated.algorithms.degreeCentrality()
      .filter(col("id") === 9L).collect()
    assert(deg9.length == 1 && deg9.head.getLong(1) == 0L)
    val lp = sess.algorithms.linkPrediction().count()
    assert(lp == 3L)
    assert(sess.algorithms.eigenvectorCentrality().count() == 5L)
  }

  test("no cartesian product in the scores plan") {
    val plan = LinkPrediction.scores(fixture, nodeCount = 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
