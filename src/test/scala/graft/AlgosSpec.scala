package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.algos.Algos
import graft.graph.{PropertyGraph, TpchGraph}

class AlgosSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mkGraph(edges: Seq[(Long, Long)]): PropertyGraph = {
    val e = edges.toDF("src", "dst")
      .withColumn("rel", lit("E")).withColumn("weight", lit(1.0))
    val n = edges.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
      .withColumn("labels", array(lit("N")))
    PropertyGraph(n, e)
  }

  test("clustering coefficients on a triangle with a tail") {
    // triangle 1-2-3 plus tail 3-4: coeff(1)=coeff(2)=1, coeff(3)=1/3, coeff(4)=0
    val g = mkGraph(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    val m = graft.algos.Algos.clusteringCoefficients(spark, g)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(1L) == 1.0 && m(2L) == 1.0)
    assert(math.abs(m(3L) - 0.333333) < 1e-6)
    assert(m(4L) == 0.0)
    val gc = graft.algos.Algos.globalClustering(spark, g)
      .collect().head.getDouble(0)
    // 1 triangle, wedges = 1+1+3+0 = 5 → 3/5
    assert(math.abs(gc - 0.6) < 1e-6)
  }

  test("convergent sssp relaxes a chain deeper than a hop bound would") {
    // 60-deep chain: a maxHops=5 run truncates at radius 5; the convergent
    // variant must relax to the end on BOTH execution branches
    val chain = (1L until 60L).map(i => (i, i + 1))
    val g = mkGraph(chain)
    val bounded = Algos.sssp(spark, g, 1L, maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bounded.size == 6 && !bounded.contains(60L))
    val localRun = Algos.ssspConverged(spark, g, 1L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(localRun.size == 60 && localRun(60L) == 59.0)
    // force the distributed Pregel branch: converges on empty message set
    spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, "0")
    try {
      val dist = Algos.ssspConverged(spark, g, 1L)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(dist == localRun, "distributed branch must match the local one")
    } finally spark.conf.unset(graft.graph.LocalGraph.MaxEdgesKey)
  }

  test("isDag detects cycles and self-loops") {
    assert(graft.algos.Algos.isDag(spark, mkGraph(Seq((1L, 2L), (2L, 3L), (1L, 3L)))))
    assert(!graft.algos.Algos.isDag(spark, mkGraph(Seq((1L, 2L), (2L, 3L), (3L, 1L)))))
    assert(!graft.algos.Algos.isDag(spark, mkGraph(Seq((1L, 2L), (2L, 2L)))))
    // forced-distributed: GraphX SCC is iteration-bounded, so the DAG
    // answer must come from the exact topo-convergence confirm, and a
    // cycle must still read false even when the SCC screen under-merges
    val prev = spark.conf.getOption(graft.graph.LocalGraph.MaxEdgesKey)
    spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, "0")
    try {
      assert(graft.algos.Algos.isDag(spark,
        mkGraph(Seq((1L, 2L), (2L, 3L), (1L, 3L)))))
      assert(!graft.algos.Algos.isDag(spark,
        mkGraph(Seq((1L, 2L), (2L, 3L), (3L, 1L)))))
    } finally prev match {
      case Some(v) => spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, v)
      case None    => spark.conf.unset(graft.graph.LocalGraph.MaxEdgesKey)
    }
  }

  test("isDag broadcast-sized fast path stays within its 2-job budget") {
    // r18: the local branch probes-and-collects edges then nodes in one
    // CollectLimit job each (LocalGraph.collectIfAtMost); the self-loop
    // screen, Tarjan, and the multi-node-component check all run on the
    // driver. This census is the regression guard — a reintroduced count,
    // separate atMost probe, or parallelize+shuffle re-aggregation of the
    // already-local component labels fails here load-invariantly.
    val g = mkGraph(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    g.edges.count(); g.nodes.count() // warm fixture outside the census
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(graft.algos.Algos.isDag(spark, g))
      Thread.sleep(100)
      assert(jobs.get <= 2,
        s"local isDag ran ${jobs.get} jobs, budget 2 - an action regrew")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("dfsPreorder visits ascending neighbors depth-first") {
    //     1 → {2, 5}; 2 → {3, 4}; 5 → {6}
    val g = mkGraph(Seq((1L, 5L), (1L, 2L), (2L, 4L), (2L, 3L), (5L, 6L)))
    val ord = graft.algos.BoundedAlgos.dfsPreorder(spark, g, 1L, lit(true))
      .orderBy("ord").collect().map(_.getLong(1)).toSeq
    assert(ord == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // force the DISTRIBUTED tree path (in-degree ≤ 1) — must agree exactly
    spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, "0")
    try {
      val dist = graft.algos.Algos.dfsPreorder(spark, g, 1L)
        .orderBy("ord").collect().map(_.getLong(1)).toSeq
      assert(dist == ord, "distributed path-sort preorder must equal the kernel")
    } finally spark.conf.unset(graft.graph.LocalGraph.MaxEdgesKey)
  }

  test("dfsPreorder orders NEGATIVE sibling ids correctly on the distributed path") {
    // two negative siblings: raw lexicographic lpad would sort '-13' before
    // '-5' but '-5' before '-7' — the zero-biased path encoding must give
    // plain ascending numeric order on both branches
    val g = mkGraph(Seq((1L, -5L), (1L, -13L), (1L, -7L), (-5L, 2L)))
    val ord = graft.algos.BoundedAlgos.dfsPreorder(spark, g, 1L, lit(true))
      .orderBy("ord").collect().map(_.getLong(1)).toSeq
    assert(ord == Seq(1L, -13L, -7L, -5L, 2L))
    spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, "0")
    try {
      val dist = graft.algos.Algos.dfsPreorder(spark, g, 1L)
        .orderBy("ord").collect().map(_.getLong(1)).toSeq
      assert(dist == ord, "signed ids must not break the path-sort preorder")
    } finally spark.conf.unset(graft.graph.LocalGraph.MaxEdgesKey)
  }

  test("dfsPreorder handles rings and falls back on branching in-edges") {
    spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, "0")
    try {
      // ring reachable from the walk: 1 → 2 → 3 → 1 (in-degree ≤ 1 everywhere)
      val ring = mkGraph(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
      val ordRing = graft.algos.Algos.dfsPreorder(spark, ring, 1L)
        .orderBy("ord").collect().map(_.getLong(1)).toSeq
      assert(ordRing == Seq(1L, 2L, 3L))
      // parallel edges must neither dup the frontier nor fake a branch
      val par = mkGraph(Seq((1L, 2L), (1L, 2L), (2L, 3L)))
      val ordPar = graft.algos.Algos.dfsPreorder(spark, par, 1L)
        .orderBy("ord").collect().map(_.getLong(1)).toSeq
      assert(ordPar == Seq(1L, 2L, 3L))
      // node 4 has two in-edges → general-graph fallback (driver kernel);
      // preorder from 1 with ascending neighbors: 1, 2, 4, 3
      val branching = mkGraph(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
      val ordB = graft.algos.Algos.dfsPreorder(spark, branching, 1L)
        .orderBy("ord").collect().map(_.getLong(1)).toSeq
      assert(ordB == Seq(1L, 2L, 4L, 3L))
    } finally spark.conf.unset(graft.graph.LocalGraph.MaxEdgesKey)
  }

  test("pageRankDF matches an independent in-memory reference") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    // textbook recurrence, driver-side
    var ref = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 5) {
      val outdeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val contribs = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => ref(u) / outdeg(u) }.sum).toMap
      ref = nodes.map(n => n -> (0.15 + 0.85 * contribs.getOrElse(n, 0.0))).toMap
    }
    val got = Algos.pageRankDF(mkGraph(edges), iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    nodes.foreach { n =>
      assert(math.abs(got(n) - ref(n)) < 1e-12, s"vertex $n: ${got(n)} vs ${ref(n)}")
    }
  }

  // GraphX staticPageRank keeps sourceless vertices at their previous rank
  // when no messages arrive (upstream quirk), so no exact cross-check here.
  test("pageRankX runs and ranks are positive") {
    val pr = Algos.pageRankX(spark, TpchGraph.partDag(spark, sf), iters = 3).collect()
    assert(pr.nonEmpty && pr.forall(_.getDouble(1) > 0))
  }

  test("connected components on two disjoint chains") {
    val g = mkGraph(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    val cc = Algos.connectedComponents(spark, g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == cc(2L) && cc(2L) == cc(3L))
    assert(cc(10L) == cc(11L))
    assert(cc(1L) != cc(10L))
  }

  test("triangle count on a known triangle") {
    val g = mkGraph(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    val tc = Algos.triangleCounts(spark, g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc(1L) == 1 && tc(2L) == 1 && tc(3L) == 1)
    assert(tc(4L) == 0)
  }

  test("sssp takes the lighter 2-hop path over the heavy direct edge") {
    val e = Seq((1L, 2L, 10.0), (1L, 3L, 1.0), (3L, 2L, 1.0))
      .toDF("src", "dst", "weight").withColumn("rel", lit("E"))
    val n = Seq(1L, 2L, 3L).toDF("id").withColumn("labels", array(lit("N")))
    val d = Algos.sssp(spark, PropertyGraph(n, e), source = 1L, maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(2L) == 2.0)
    assert(d(3L) == 1.0)
  }

  test("kCore retains the clique, drops the tail") {
    // 4-clique with a pendant chain: 3-core = the clique only
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val g = mkGraph(clique ++ Seq((4L, 5L), (5L, 6L)))
    val core = Algos.kCore(g, k = 3).collect().map(_.getLong(0)).toSet
    assert(core == Set(1L, 2L, 3L, 4L))
  }

  test("clustering local kernels ≡ GraphX/DataFrame branches (gate forced off)") {
    // two triangles sharing an edge, plus a self-loop, a duplicate edge in
    // both orientations, an isolated node (in nodes but not edges), and an
    // edge endpoint missing from the node frame (id 9)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 3L),
      (1L, 1L), (2L, 1L), (1L, 2L), (4L, 9L)).toDF("src", "dst")
      .withColumn("rel", lit("E")).withColumn("weight", lit(1.0))
    val n = Seq(1L, 2L, 3L, 4L, 7L).toDF("id")
      .withColumn("labels", array(lit("N")))
    val g = PropertyGraph(n, e)
    def all() = (
      Algos.triangleCounts(spark, g).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      Algos.clusteringCoefficients(spark, g).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap,
      Algos.globalClustering(spark, g).collect().head.getDouble(0))
    val (triL, ccL, gcL) = all()
    val prev = spark.conf.getOption(graft.graph.LocalGraph.MaxEdgesKey)
    spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, "0")
    try {
      val (triD, ccD, gcD) = all()
      assert(triL == triD)
      assert(ccL == ccD)
      assert(gcL == gcD)
      assert(triL(1L) == 1L && triL(2L) == 2L && triL(9L) == 0L)
      assert(ccL(7L) == ((0L, 0.0))) // isolated node: deg 0, coeff 0
      assert(!ccL.contains(9L)) // coefficients are per declared node
    } finally prev match {
      case Some(v) => spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, v)
      case None    => spark.conf.unset(graft.graph.LocalGraph.MaxEdgesKey)
    }
  }

  test("kCore local kernel ≡ distributed loop (same graph, gate forced off)") {
    // nested cores + duplicate/self-loop edges so the dedup and the
    // alive-to-alive degree count are both exercised: 4-clique (3-core),
    // a triangle hanging off it (2-core), a pendant chain, a self-loop
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val extra = Seq((4L, 7L), (7L, 8L), (8L, 4L), // triangle on node 4
      (8L, 9L), (9L, 10L), // chain
      (1L, 2L), (2L, 1L), // duplicate edge, both directions
      (9L, 9L)) // self-loop
    val g = mkGraph(clique ++ extra)
    val local = Algos.kCore(g, k = 2).collect().map(_.getLong(0)).toSet
    val prev = spark.conf.getOption(graft.graph.LocalGraph.MaxEdgesKey)
    spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, "0")
    try {
      val dist = Algos.kCore(g, k = 2).collect().map(_.getLong(0)).toSet
      assert(local == dist)
      // 9 survives at k=2: the self-loop plus the edge to 8 give it
      // alive-to-alive degree 2 in both branches once 10 is peeled
      assert(local == Set(1L, 2L, 3L, 4L, 7L, 8L, 9L))
    } finally prev match {
      case Some(v) => spark.conf.set(graft.graph.LocalGraph.MaxEdgesKey, v)
      case None    => spark.conf.unset(graft.graph.LocalGraph.MaxEdgesKey)
    }
  }
}
