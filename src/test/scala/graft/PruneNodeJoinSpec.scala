package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.compiler.Compiler
import graft.frontends.cypher.CypherFrontend
import graft.graph.PropertyGraph
import graft.ir.{Expr, Op}
import graft.graph.{Direction, Out}

/** Node-join elision (Compiler.prunableNodeVars): a pattern variable whose
  * properties/labels are never read must not cost a node-table join per hop —
  * at 100 TB that join is a full shuffle of the node table. These specs pin
  * both the semantics (identical results with the pass on and off) and the
  * plan shape (zero joins for a bare edge-count pattern).
  */
class PruneNodeJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val g = {
    val nodes = Seq(
      (1L, Seq("Person"), "ann"), (2L, Seq("Person"), "bob"),
      (3L, Seq("City"), "rome"), (4L, Seq("City"), "oslo")
    ).toDF("id", "labels", "name")
    val edges = Seq(
      (1L, 2L, "KNOWS"), (1L, 3L, "LIVES_IN"),
      (2L, 3L, "LIVES_IN"), (2L, 4L, "VISITED")
    ).toDF("src", "dst", "rel")
    PropertyGraph(nodes, edges)
  }

  private def run(q: String, prune: Boolean) = {
    spark.conf.set("spark.graft.pruneNodeJoins", prune.toString)
    try new Compiler(spark, g).compile(CypherFrontend.translateText(q))
    finally spark.conf.set("spark.graft.pruneNodeJoins", "true")
  }

  private def sortedRows(q: String, prune: Boolean): Seq[String] =
    run(q, prune).collect().map(_.toString).sorted.toSeq

  test("pruned plans return identical results") {
    for (q <- Seq(
      "MATCH (a)-[:LIVES_IN]->(c) RETURN c.name AS city, count(*) AS n ORDER BY city",
      "MATCH (a)-[:KNOWS]->(b)-[:LIVES_IN]->(c) RETURN a.name AS n, c.name AS m",
      "MATCH (a:Person)-[:LIVES_IN]->(c:City) RETURN count(*) AS n",
      "MATCH (a)-[:KNOWS|LIVES_IN]->(b) RETURN count(*) AS n",
      "MATCH (a)-[*1..2]->(b) RETURN count(*) AS n"
    )) assert(sortedRows(q, prune = true) == sortedRows(q, prune = false), q)
  }

  test("bare edge-count pattern compiles to a join-free edge scan") {
    val df = run("MATCH (a)-[:KNOWS]->(b) RETURN count(*) AS n", prune = true)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"expected no joins, got:\n$plan")
    assert(df.collect().head.getLong(0) == 1L)
  }

  test("labeled prunable target becomes a semi-join, values stay right") {
    val df = run(
      "MATCH (a:Person)-[:LIVES_IN]->(c:City) RETURN count(*) AS n", prune = true)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join for :City, got:\n$plan")
    assert(df.collect().head.getLong(0) == 2L)
  }

  test("reading labels(b) keeps the node join") {
    val rows = run(
      "MATCH (a)-[:KNOWS]->(b) RETURN b.name AS n, labels(b) AS l", prune = true)
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("bob"))
  }

  test("analysis: projection root gates, prop/label reads mark needed") {
    val expand = Op.Expand(Op.NodeScan("a", None), "a", Seq("KNOWS"), "b",
      Out, None)
    // bare pattern (mutation match prefix shape): no pruning
    assert(Compiler.prunableNodeVars(expand).isEmpty)
    // projected count: both ends prunable
    val counted = Op.Aggregate(expand, Seq.empty,
      Seq((Expr.Func("count", Seq(Expr.Lit(1))), "n")))
    assert(Compiler.prunableNodeVars(counted) == Set("a", "b"))
    // a property read on one end keeps that end only
    val proj = Op.Project(expand, Seq((Expr.Prop("b", "name"), "n")))
    assert(Compiler.prunableNodeVars(proj) == Set("a"))
    // labels()/properties() on a bare var keep it
    val lab = Op.Project(expand,
      Seq((Expr.Func("labels", Seq(Expr.Var("b"))), "l")))
    assert(Compiler.prunableNodeVars(lab) == Set("a"))
  }
}
