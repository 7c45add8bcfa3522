package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.compiler.Compiler
import graft.frontends.cypher.CypherFrontend
import graft.graph.PropertyGraph

/** Multi-label node patterns `(n:A:B)` — conjunction over the node's label
  * set (reference cypher ast.rs:104 NodePattern.labels Vec<String>). The
  * first label rides the scan; the rest compile to hasLabel() filters that
  * Catalyst pushes into the same scan.
  */
class MultiLabelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val g = {
    val nodes = Seq(
      (1L, Seq("Person", "Admin"), "ann"),
      (2L, Seq("Person"), "bob"),
      (3L, Seq("Person", "Admin", "Owner"), "cat"),
      (4L, Seq("City"), "rome")
    ).toDF("id", "labels", "name")
    val edges = Seq(
      (1L, 4L, "LIVES_IN"), (2L, 4L, "LIVES_IN"), (3L, 4L, "LIVES_IN")
    ).toDF("src", "dst", "rel")
    PropertyGraph(nodes, edges)
  }

  private def cy(q: String) =
    new Compiler(spark, g).compile(CypherFrontend.translateText(q))

  test("(n:A:B) matches only nodes carrying every label") {
    val names = cy("MATCH (n:Person:Admin) RETURN n.name AS nm ORDER BY nm")
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("ann", "cat"))
  }

  test("three-label conjunction") {
    val names = cy("MATCH (n:Person:Admin:Owner) RETURN n.name AS nm")
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("cat"))
  }

  test("multi-label on an expand target") {
    val n = cy(
      "MATCH (n:Person:Admin)-[:LIVES_IN]->(c:City) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(n == 2L)
  }

  test("multi-label filter survives the prune-node-join pass") {
    // the hasLabel() read marks the variable needed, so the label data stays
    val n = cy("MATCH (n:Person:Admin)-[:LIVES_IN]->(c) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(n == 2L)
  }

  test("CREATE with multiple labels stores all of them") {
    val sess = new GraftSession(spark, g)
    val g2 = sess.cypherUpdate("CREATE (x:Person:Admin {id: 9, name: 'zed'})")
    val names = new Compiler(spark, g2)
      .compile(CypherFrontend.translateText(
        "MATCH (n:Person:Admin) RETURN n.name AS nm ORDER BY nm"))
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("ann", "cat", "zed"))
  }
}
