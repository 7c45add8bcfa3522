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

  test("createNodes routes unknown columns to props, null-fills missing ones") {
    // keys outside the typed schema land in the map fallback (SURVEY §1.3)
    val g1 = Mutations.createNodes(g0,
      Seq((4L, Seq("A"), "w", 1.0)).toDF("id", "labels", "name", "bogus"))
    val r1 = g1.nodes.filter($"id" === 4).collect().head
    assert(r1.getAs[Map[String, String]]("props") == Map("bogus" -> "1.0"))
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

  test("CREATE with ad-hoc keys routes them into the props map fallback") {
    val g1 = session.cypherUpdate(
      "CREATE (n:Gadget {id: 977000, name: 'gizmo', vendor: 'acme', tier: 3})")
    val s2 = new GraftSession(spark, g1)
    val row = s2.cypher(
      """MATCH (n:Gadget) WHERE n.vendor = 'acme'
        |RETURN n.name AS nm, n.vendor AS v, n.tier AS t""".stripMargin)
      .collect()
    assert(row.length == 1)
    assert(row.head.getString(0) == "gizmo")
    assert(row.head.getString(1) == "acme")
    assert(row.head.getString(2) == "3") // dynamic values are strings
    // typed columns of pre-existing nodes are untouched
    assert(g1.nodes.filter(col("props").isNotNull).count() == 1)
  }

  test("createEdges routes unknown columns into the edge props map") {
    import spark.implicits._
    val base = session.graph
    val e = Seq((TpchGraph.RegionTag * TpchGraph.Stride + 0L,
        TpchGraph.RegionTag * TpchGraph.Stride + 1L))
      .toDF("src", "dst")
      .withColumn("rel", lit("LINKED"))
      .withColumn("since", lit("2024"))
    val g1 = Mutations.createEdges(base, e)
    val row = g1.edges.filter(col("rel") === "LINKED").collect()
    assert(row.length == 1)
    assert(row.head.getAs[Map[String, String]]("props") == Map("since" -> "2024"))
    // dynamic edge property reads back through the expand fallback
    val got = new GraftSession(spark, g1).cypher(
      """MATCH (a:Region)-[r:LINKED]->(b:Region)
        |RETURN r.since AS s""".stripMargin).collect()
    assert(got.length == 1 && got.head.getString(0) == "2024")
  }

  test("properties() merges dynamic entries with typed columns") {
    val g1 = session.cypherUpdate(
      "CREATE (n:Thing {id: 988000, name: 'th', extra: 'x1'})")
    val m = new GraftSession(spark, g1).cypher(
      "MATCH (n:Thing) RETURN properties(n) AS p").collect().head
      .getMap[String, String](0)
    assert(m("name") == "th")
    assert(m("extra") == "x1")
    assert(!m.contains("props"))
  }

  test("edges-only props map does not break node-variable reads") {
    import spark.implicits._
    // only the EDGE table carries a props column: properties(n) and typed
    // node reads must compile against node columns only (per-kind gating)
    val nodes = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .select(col("id"), array(lit("N")).as("labels"), col("name"))
    val edges = Seq((1L, 2L)).toDF("src", "dst")
      .select(col("src"), col("dst"), lit("E").as("rel"),
        map(lit("since"), lit("2020")).as("props"))
    val s2 = new GraftSession(spark, graft.graph.PropertyGraph(nodes, edges))
    val p = s2.cypher("MATCH (n:N {name: 'a'}) RETURN properties(n) AS p")
      .collect().head.getMap[String, String](0)
    assert(p == Map("name" -> "a"))
    // the edge variable still resolves its dynamic key through the map
    val since = s2.cypher(
      "MATCH (a:N)-[r:E]->(b:N) RETURN r.since AS s").collect().head.getString(0)
    assert(since == "2020")
  }

  test("SET on an unknown key writes through the props map") {
    val g1 = session.cypherUpdate(
      "MATCH (r:Region) SET r.zone = 'z1'")
    val s2 = new GraftSession(spark, g1)
    val zones = s2.cypher(
      "MATCH (r:Region) RETURN r.zone AS z").collect().map(_.getString(0))
    assert(zones.nonEmpty && zones.forall(_ == "z1"))
    // overwrite an existing dynamic key (map_concat dedup guard)
    val g2 = Mutations.setNodeProperty(g1,
      array_contains(col("labels"), "Region"), "zone", lit("z2"))
    val z2 = new GraftSession(spark, g2).cypher(
      "MATCH (r:Region) RETURN r.zone AS z").collect().map(_.getString(0))
    assert(z2.nonEmpty && z2.forall(_ == "z2"))
  }

  test("transactions: staged writes isolated until commit, rollback discards") {
    val before = session.cypher("MATCH (r:Region) RETURN count(*) AS n")
      .collect().head.getLong(0)
    val tx = session.beginTransaction()
    tx.cypherUpdate("CREATE (:Region {id: 991001, name: 'TX_REGION'})")
    // the transaction sees its staged write…
    val inside = tx.cypher("MATCH (r:Region) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(inside == before + 1)
    // …the base session does not (snapshot isolation)
    val outside = session.cypher("MATCH (r:Region) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(outside == before)
    // commit hands back the staged graph; the tx is closed after
    val committed = tx.commit()
    assert(new GraftSession(spark, committed)
      .cypher("MATCH (r:Region) RETURN count(*) AS n")
      .collect().head.getLong(0) == before + 1)
    assertThrows[IllegalArgumentException](tx.cypherUpdate("CREATE (:Region {id: 1})"))
    // rollback rewinds to the begin snapshot
    val tx2 = session.beginTransaction()
    tx2.cypherUpdate("CREATE (:Region {id: 991002})")
    tx2.rollback()
    assert(tx2.graph.nodes.count() == session.graph.nodes.count())
  }

  test("read-only query through cypherUpdate is rejected") {
    assertThrows[IllegalArgumentException](
      session.cypherUpdate("MATCH (n:Region) RETURN n.name AS x"))
  }

  private def tinyGraph = {
    import spark.implicits._
    PropertyGraph(
      Seq((1L, Seq("A", "Hot"), "x"), (2L, Seq("A"), "y"), (3L, Seq("B"), "z"))
        .toDF("id", "labels", "name"),
      Seq((1L, 2L, "E", 1.5), (2L, 3L, "E", 2.5)).toDF("src", "dst", "rel", "w"))
  }

  test("REMOVE n.prop nulls a typed column for matched rows only") {
    val g2 = Mutations.removeNodeProperty(tinyGraph, col("id") === 1L, "name")
    val names = g2.nodes.orderBy("id").collect().map(r => Option(r.getString(2)))
    assert(names.toSeq == Seq(None, Some("y"), Some("z")))
  }

  test("REMOVE n.prop drops a dynamic key from the props map") {
    val g = tinyGraph
    val withMap = g.copy(nodes = g.nodes.withColumn("props",
      map(lit("k1"), lit("v1"), lit("k2"), lit("v2"))))
    val g2 = Mutations.removeNodeProperty(withMap, col("id") === 2L, "k1")
    val keys = g2.nodes.orderBy("id")
      .select(map_keys(col("props"))).collect().map(_.getSeq[String](0).sorted)
    assert(keys.toSeq == Seq(Seq("k1", "k2"), Seq("k2"), Seq("k1", "k2")))
  }

  test("cypherUpdate REMOVE handles property, label and mixed items") {
    val s2 = new GraftSession(spark, tinyGraph)
    val g2 = s2.cypherUpdate("MATCH (n:A) WHERE n.name = 'x' REMOVE n.name, n:Hot")
    val row = g2.nodes.filter(col("id") === 1L).collect().head
    assert(row.getSeq[String](1) == Seq("A"))
    assert(row.isNullAt(2))
    val other = g2.nodes.filter(col("id") === 2L).collect().head
    assert(other.getString(2) == "y")
  }

  test("removeEdgeProperty nulls the matched edge rows only") {
    val g2 = Mutations.removeEdgeProperty(tinyGraph, col("src") === 1L, "w")
    val ws = g2.edges.orderBy("src").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(ws.toSeq == Seq(None, Some(2.5)))
  }
}
