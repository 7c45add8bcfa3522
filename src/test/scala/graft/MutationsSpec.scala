package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{Mutations, PropertyGraph}

class MutationsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def g0: PropertyGraph = {
    val n = Seq((1L, Seq("A"), "x"), (2L, Seq("A"), "y"), (3L, Seq("B"), "z"))
      .toDF("id", "labels", "name")
    val e = Seq((1L, 2L, "E"), (2L, 3L, "E")).toDF("src", "dst", "rel")
    PropertyGraph(n, e)
  }

  test("createNodes rejects unknown columns, null-fills missing ones") {
    assertThrows[IllegalArgumentException](
      Mutations.createNodes(g0, Seq((4L, Seq("A"), "w", 1.0)).toDF("id", "labels", "name", "bogus")))
    val g2 = Mutations.createNodes(g0, Seq((4L, Seq("C"))).toDF("id", "labels"))
    val row = g2.nodes.filter($"id" === 4).collect().head
    assert(row.getAs[String]("name") == null)
    assert(g2.nodes.count() == 4)
  }

  test("delete without detach keeps attached nodes") {
    val g2 = Mutations.deleteNodes(g0, col("id") === 2, detach = false)
    assert(g2.nodes.count() == 3) // node 2 has edges → kept
    val g3 = Mutations.deleteNodes(g0, col("id") === 2, detach = true)
    assert(g3.nodes.count() == 2)
    assert(g3.edges.count() == 0) // both edges touched node 2
  }

  test("merge matches on key and creates the rest") {
    val incoming = Seq((10L, Seq("A"), "x"), (11L, Seq("A"), "new"))
      .toDF("id", "labels", "name")
    val g2 = Mutations.mergeNodes(g0, incoming, "name",
      onMatchSet = Map("name" -> concat(col("name"), lit("!"))),
      onCreateSet = Map.empty)
    val names = g2.nodes.select("name").collect().map(_.getString(0)).toSet
    assert(names == Set("x!", "y", "z", "new"))
    assert(g2.nodes.count() == 4)
  }
}

class CypherUpdateSpec extends AnyFunSuite {
  import TestSpark._
  import graft.graph.TpchGraph

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))

  test("CREATE node then MERGE is idempotent on the key") {
    val g1 = session.cypherUpdate("CREATE (h:Hub {id: 777, name: 'hub'})")
    assert(g1.nodesWithLabel("Hub").count() == 1)
    val g2 = new GraftSession(spark, g1)
      .cypherUpdate("MERGE (h:Hub {name: 'hub', id: 777})")
    assert(g2.nodesWithLabel("Hub").count() == 1)
  }

  test("MATCH … CREATE relationship from bindings") {
    val g1 = session.cypherUpdate(
      """MATCH (s:Supplier)-[:FROM_NATION]->(n:Nation)
        |CREATE (n)-[:HAS_SUPPLIER]->(s)""".stripMargin)
    val nEdges = g1.edgesOfType("HAS_SUPPLIER").count()
    assert(nEdges == spark.read.parquet(s"$sf/supplier.parquet").count())
  }

  test("DETACH DELETE removes nodes and incident edges") {
    val g1 = session.cypherUpdate("MATCH (o:Order) DETACH DELETE o")
    assert(g1.nodesWithLabel("Order").count() == 0)
    assert(g1.edgesOfType("PLACED_BY").count() == 0)
    assert(g1.edgesOfType("IN_REGION").count() > 0)
  }

  test("REMOVE label") {
    val g1 = session.cypherUpdate("MATCH (r:Region) REMOVE r:Region")
    assert(g1.nodesWithLabel("Region").count() == 0)
    assert(g1.nodes.count() == session.graph.nodes.count())
  }

  test("read-only query through cypherUpdate is rejected") {
    assertThrows[IllegalArgumentException](
      session.cypherUpdate("MATCH (n:Region) RETURN n.name AS x"))
  }
}
