package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.TpchGraph

/** Cyclic-pattern split (`spark.graft.cypher.cycleSplit`): a long
  * cycle breaks at its midpoint into two arms anchored at the cycle
  * variable, natural-joined on {anchor, midpoint} — same conjunctive query,
  * so the result bag must be IDENTICAL to the default left-to-right plan,
  * while the widest intermediate shrinks from the unfiltered far side to
  * the filtered anchor's neighborhood (the wedge explosion WCOJ kills).
  * Session default is `auto` (CycleAdvisor margin decides per pattern);
  * explicit `off` keeps the chain plan and only logs proposals.
  */
class CycleSplitSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.01"

  private val cycle =
    """MATCH (p:Part)<-[:SUPPLIES]-(s:Supplier)-[:FROM_NATION]->(n:Nation)<-[:FROM_NATION]-(c:Customer)<-[:PLACED_BY]-(o:Order)-[:CONTAINS]->(p)
      |WHERE id(p) - 5000000000000 < 50
      |RETURN n.name AS nat, count(*) AS cnt
      |ORDER BY nat""".stripMargin

  private def run(split: Boolean) = {
    spark.conf.set("spark.graft.cypher.cycleSplit", split.toString)
    try new GraftSession(spark, TpchGraph(spark, sf)).cypher(cycle).collect().toSeq
    finally spark.conf.unset("spark.graft.cypher.cycleSplit")
  }

  test("flag-on results are identical to the default plan") {
    val off = run(split = false)
    val on = run(split = true)
    assert(on == off, "cycle split must be purely algebraic")
    assert(off.nonEmpty)
  }

  test("flag-on plan joins two arms instead of one linear chain") {
    def joinCount(split: Boolean): Int = {
      spark.conf.set("spark.graft.cypher.cycleSplit", split.toString)
      try {
        val df = new GraftSession(spark, TpchGraph(spark, sf)).cypher(cycle)
        "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r
          .findAllIn(df.queryExecution.executedPlan.toString).size
      } finally spark.conf.unset("spark.graft.cypher.cycleSplit")
    }
    // the DISTINGUISHING shape: both arms re-anchor at the cycle variable
    // and meet in an extra arm-merge join, so the split plan must carry
    // strictly MORE joins than the default linear chain (a vacuous >= k
    // would pass even if the splitCycle guard regressed to never firing)
    val (chain, split) = (joinCount(split = false), joinCount(split = true))
    assert(split > chain,
      s"split plan must add the arm-merge join: chain=$chain split=$split")
  }

  test("flag off logs a data-driven split proposal, plan unchanged") {
    // the TPC-H graph's fanout (|E|/|V| ≈ 7) makes the 5-hop chain
    // estimate f^4 beat the split estimate f^3 + f^2 by ~f — the advisor
    // must log a proposal when the flag is off, and must NOT touch the plan
    val off = run(split = false)
    val prop = graft.frontends.cypher.CycleAdvisor.lastProposal
    assert(prop.isDefined, "qualifying cycle under the off flag must propose")
    assert(prop.get.contains("5-hop") && prop.get.contains("cycleSplit=true"))
    assert(off.nonEmpty)
    // acyclic patterns must not propose: each translation starts with a
    // clean advisor slate (stale notes from a failed translation must not
    // be evaluated against the next query's graph), so after an acyclic
    // query the thread's proposal is EMPTY, not the previous query's
    val sess = new GraftSession(spark, TpchGraph(spark, sf))
    sess.cypher(
      """MATCH (s:Supplier)-[:FROM_NATION]->(n:Nation)
        |RETURN count(*) AS n""".stripMargin).collect()
    assert(graft.frontends.cypher.CycleAdvisor.lastProposal.isEmpty)
  }

  private def runAuto(sfDir: String) = {
    spark.conf.set("spark.graft.cypher.cycleSplit", "auto")
    try new GraftSession(spark, TpchGraph(spark, sfDir)).cypher(cycle)
    finally spark.conf.unset("spark.graft.cypher.cycleSplit")
  }

  test("cycleSplit=auto enables the split when the advisor margin holds — results identical at two SFs") {
    for (sfDir <- Seq(sf, "/root/testdata/sf0.1")) {
      val off = {
        spark.conf.set("spark.graft.cypher.cycleSplit", "false")
        try new GraftSession(spark, TpchGraph(spark, sfDir)).cypher(cycle).collect().toSeq
        finally spark.conf.unset("spark.graft.cypher.cycleSplit")
      }
      val auto = runAuto(sfDir)
      // the TPC-H fanout (~7) clears the 4x margin for the 5-hop cycle, so
      // auto must pick the SPLIT plan (the extra arm-merge join)...
      val chainJoins = {
        spark.conf.set("spark.graft.cypher.cycleSplit", "false")
        try "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r.findAllIn(
          new GraftSession(spark, TpchGraph(spark, sfDir)).cypher(cycle)
            .queryExecution.executedPlan.toString).size
        finally spark.conf.unset("spark.graft.cypher.cycleSplit")
      }
      val autoJoins = "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r
        .findAllIn(auto.queryExecution.executedPlan.toString).size
      assert(autoJoins > chainJoins,
        s"auto must apply the split when the margin holds: chain=$chainJoins auto=$autoJoins ($sfDir)")
      // ... and the split stays purely algebraic: bag-identical results
      assert(auto.collect().toSeq == off, s"auto results must equal the default plan ($sfDir)")
    }
  }

  test("cycleSplit=auto leaves sub-margin cycles on the chain plan") {
    // ring graph (every node out-degree 1, fanout estimate ~1): a 5-hop
    // cycle structurally qualifies for the split, but chain f^4 cannot
    // beat 4*(f^3 + f^2) at f ~ 1 — auto must keep the left-to-right chain
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 100L
    val ringNodes = (0L until n).toDF("id")
      .select(col("id"), array(lit("N")).as("labels"))
    val ringEdges = (0L until n).map(k => (k, (k + 1) % n)).toDF("src", "dst")
      .select(col("src"), col("dst"), lit("L").as("rel"), lit(1.0).as("weight"))
    val ring = graft.graph.PropertyGraph(ringNodes, ringEdges)
    val short =
      """MATCH (a:N)-[:L]->(b)-[:L]->(c)-[:L]->(d)-[:L]->(e)-[:L]->(a)
        |RETURN count(*) AS cnt""".stripMargin
    def joins(mode: String): Int = {
      spark.conf.set("spark.graft.cypher.cycleSplit", mode)
      try "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r.findAllIn(
        new GraftSession(spark, ring).cypher(short)
          .queryExecution.executedPlan.toString).size
      finally spark.conf.unset("spark.graft.cypher.cycleSplit")
    }
    assert(joins("auto") == joins("false"),
      "sub-margin cycle must not split under auto")
    // sanity: the pattern DOES qualify structurally — forcing true splits it
    assert(joins("true") > joins("false"))
  }

  test("cycleSplit=auto splits only the patterns whose own margin wins") {
    // one query, two qualifying cycles, on a SYNTHETIC fanout-3 graph
    // (exact LocalRelation stats, so the estimate can't drift with cache
    // state the way parquet sizeInBytes heuristics do): at f = 3 the
    // 7-hop cycle's chain estimate f^6 = 729 clears 4×(f^4 + f^3) = 432,
    // while the 5-hop's f^4 = 81 loses to 4×(f^3 + f^2) = 144 — auto must
    // split the 7-hop pattern and leave the 5-hop on its chain plan (a
    // blanket "split everything that qualifies" would pessimize it)
    import spark.implicits._
    val n = 60L
    val nodes = (0L until n).toDF("id")
      .select(col("id"), array(lit("N")).as("labels"))
    val edges = (0L until n).flatMap(k => Seq(1L, 7L, 13L).map(d => (k, (k + d) % n)))
      .toDF("src", "dst")
      .select(col("src"), col("dst"), lit("L").as("rel"), lit(1.0).as("weight"))
    val g = graft.graph.PropertyGraph(nodes, edges)
    val twoCycles =
      """MATCH (a:N)-[:L]->(b)-[:L]->(c)-[:L]->(d)-[:L]->(e)-[:L]->(f)-[:L]->(h)-[:L]->(a)
        |MATCH (q:N)-[:L]->(r)-[:L]->(t)-[:L]->(u)-[:L]->(v)-[:L]->(q)
        |RETURN count(*) AS cnt""".stripMargin
    def joins(mode: String): Int = {
      spark.conf.set("spark.graft.cypher.cycleSplit", mode)
      try "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r.findAllIn(
        new GraftSession(spark, g).cypher(twoCycles)
          .queryExecution.executedPlan.toString).size
      finally spark.conf.unset("spark.graft.cypher.cycleSplit")
    }
    val (chain, auto, all) = (joins("false"), joins("auto"), joins("true"))
    assert(auto > chain, s"auto must split the winning 7-hop cycle: chain=$chain auto=$auto")
    assert(auto < all, s"auto must NOT split the sub-margin 5-hop cycle: auto=$auto true=$all")
    // and the selective split stays purely algebraic
    def rows(mode: String) = {
      spark.conf.set("spark.graft.cypher.cycleSplit", mode)
      try new GraftSession(spark, g).cypher(twoCycles).collect().toSeq
      finally spark.conf.unset("spark.graft.cypher.cycleSplit")
    }
    assert(rows("auto") == rows("false"))
  }

  test("unset conf defaults to auto: winning cycle splits, sub-margin ring stays chained") {
    import spark.implicits._
    def joinsOf(g: graft.graph.PropertyGraph, q: String,
        mode: Option[String]): Int = {
      mode match {
        case Some(m) => spark.conf.set("spark.graft.cypher.cycleSplit", m)
        case None    => spark.conf.unset("spark.graft.cypher.cycleSplit")
      }
      try "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r.findAllIn(
        new GraftSession(spark, g).cypher(q)
          .queryExecution.executedPlan.toString).size
      finally spark.conf.unset("spark.graft.cypher.cycleSplit")
    }
    // fanout-3 LocalRelation fixture, margin-winning 7-hop cycle
    val n = 60L
    val nodes = (0L until n).toDF("id")
      .select(col("id"), array(lit("N")).as("labels"))
    val edges = (0L until n).flatMap(k => Seq(1L, 7L, 13L).map(d => (k, (k + d) % n)))
      .toDF("src", "dst")
      .select(col("src"), col("dst"), lit("L").as("rel"), lit(1.0).as("weight"))
    val g = graft.graph.PropertyGraph(nodes, edges)
    val seven =
      """MATCH (a:N)-[:L]->(b)-[:L]->(c)-[:L]->(d)-[:L]->(e)-[:L]->(f)-[:L]->(h)-[:L]->(a)
        |RETURN count(*) AS cnt""".stripMargin
    assert(joinsOf(g, seven, None) == joinsOf(g, seven, Some("auto")),
      "unset conf must behave exactly like auto on a winning cycle")
    assert(joinsOf(g, seven, None) > joinsOf(g, seven, Some("false")),
      "the winning cycle must split under the default")
    // fanout-1 ring: the advisor's negative case — default must keep chain
    val ringNodes = (0L until n).toDF("id")
      .select(col("id"), array(lit("N")).as("labels"))
    val ringEdges = (0L until n).map(k => (k, (k + 1) % n)).toDF("src", "dst")
      .select(col("src"), col("dst"), lit("L").as("rel"), lit(1.0).as("weight"))
    val ring = graft.graph.PropertyGraph(ringNodes, ringEdges)
    val five =
      """MATCH (a:N)-[:L]->(b)-[:L]->(c)-[:L]->(d)-[:L]->(e)-[:L]->(a)
        |RETURN count(*) AS cnt""".stripMargin
    assert(joinsOf(ring, five, None) == joinsOf(ring, five, Some("false")),
      "a sub-margin cycle must stay on the chain plan under the default")
  }

  test("non-cyclic and short-cycle patterns are untouched by the flag") {
    spark.conf.set("spark.graft.cypher.cycleSplit", "true")
    try {
      val sess = new GraftSession(spark, TpchGraph(spark, sf))
      // 2-hop chain (acyclic) — must still work, and a 2-hop cycle
      // (below the 4-hop split threshold) keeps the rebind-filter path
      val chain = sess.cypher(
        """MATCH (s:Supplier)-[:FROM_NATION]->(n:Nation)<-[:FROM_NATION]-(c:Customer)
          |WHERE n.name = 'NATION_3'
          |RETURN count(*) AS n""".stripMargin).collect()
      assert(chain.head.getLong(0) > 0)
    } finally spark.conf.unset("spark.graft.cypher.cycleSplit")
  }
}
