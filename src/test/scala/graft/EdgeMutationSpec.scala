package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** SET r.prop / REMOVE r.prop / DELETE r on relationship variables — the
  * edge-table counterparts of the node mutations (reference database.rs:945
  * set_edge_property, :974 remove_edge_property, :931 delete_edge), keyed by
  * the synthesized eid the MATCH prefix binds.
  */
class EdgeMutationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def g = {
    val nodes = Seq(
      (1L, Seq("Person"), "ann"), (2L, Seq("Person"), "bob"),
      (3L, Seq("City"), "rome")
    ).toDF("id", "labels", "name")
    val edges = Seq(
      (1L, 2L, "KNOWS", 1.0), (1L, 3L, "LIVES_IN", 2.0),
      (2L, 3L, "LIVES_IN", 3.0)
    ).toDF("src", "dst", "rel", "weight")
    PropertyGraph(nodes, edges)
  }

  test("SET r.weight rewrites only the matched edges") {
    val g2 = new GraftSession(spark, g).cypherUpdate(
      "MATCH (:Person)-[r:LIVES_IN]->(:City) SET r.weight = r.weight * 10")
    val weights = g2.edges.orderBy("src", "dst")
      .select("weight").as[Double].collect().toSeq
    assert(weights == Seq(1.0, 20.0, 30.0))
    assert(!g2.edges.columns.contains("eid"), "synthesized eid must not leak")
  }

  test("SET r.prop with a dynamic key lands in the edge props map") {
    val g2 = new GraftSession(spark, g).cypherUpdate(
      "MATCH ()-[r:KNOWS]->() SET r.since = 2020")
    val since = g2.edges.filter(col("rel") === "KNOWS")
      .select(element_at(col("props"), "since")).as[String].collect().toSeq
    assert(since == Seq("2020"))
  }

  test("REMOVE r.weight nulls the property on matched edges only") {
    val g2 = new GraftSession(spark, g).cypherUpdate(
      "MATCH ()-[r:KNOWS]->() REMOVE r.weight")
    val rows = g2.edges.orderBy("src", "dst")
      .select("rel", "weight").collect()
    assert(rows.find(_.getString(0) == "KNOWS").get.isNullAt(1))
    assert(rows.count(!_.isNullAt(1)) == 2)
  }

  test("DELETE r removes exactly the matched edges, nodes survive") {
    val g2 = new GraftSession(spark, g).cypherUpdate(
      "MATCH (p:Person {name: 'ann'})-[r:LIVES_IN]->(:City) DELETE r")
    assert(g2.edges.count() == 2)
    assert(g2.edges.filter(col("src") === 1L && col("rel") === "LIVES_IN").count() == 0)
    assert(g2.nodes.count() == 3)
  }

  test("parallel edges: a later clause hits the edge the bindings identified") {
    // two parallel (1,2,KNOWS) edges distinguished only by weight — eids are
    // assigned ONCE per run, so after the SET rewrites the matched edge's
    // weight (changing the parallel-edge tie-break hash), the DELETE in the
    // same query must still remove THAT edge, not its twin
    val nodes = Seq((1L, Seq("P"), "a"), (2L, Seq("P"), "b"))
      .toDF("id", "labels", "name")
    val edges = Seq((1L, 2L, "KNOWS", 1.0), (1L, 2L, "KNOWS", 2.0))
      .toDF("src", "dst", "rel", "weight")
    val g2 = new GraftSession(spark, PropertyGraph(nodes, edges)).cypherUpdate(
      "MATCH ()-[r:KNOWS]->() WHERE r.weight = 1.0 SET r.weight = 9.0 DELETE r")
    val left = g2.edges.select("weight").as[Double].collect().toSeq
    assert(left == Seq(2.0), s"the untouched parallel edge must survive, got $left")
    assert(!g2.edges.columns.contains("eid"))
  }

  test("mixed DELETE: edge var and node var in one clause") {
    val g2 = new GraftSession(spark, g).cypherUpdate(
      "MATCH (p:Person {name: 'bob'})-[r:KNOWS]-() DELETE r")
    assert(g2.edges.filter(col("rel") === "KNOWS").count() == 0)
    assert(g2.edges.count() == 2)
  }

  test("dynamic-key WHERE predicates fall back to the generic eid path") {
    // r.since lives in the props map, not a typed column — the pushdown
    // path must decline (an unguarded col("since") would fail analysis)
    // and the generic compiled path must still resolve it
    val g2 = new GraftSession(spark, g).cypherUpdate(
      "MATCH ()-[r:KNOWS]->() SET r.since = 2020")
    val g3 = new GraftSession(spark, g2).cypherUpdate(
      "MATCH ()-[r:KNOWS]->() WHERE r.since = 2020 SET r.weight = 7.0")
    assert(g3.edges.filter(col("rel") === "KNOWS")
      .select("weight").as[Double].collect().toSeq == Seq(7.0))
  }

  test("pushdown SET: endpoint + edge predicates, both pattern orientations") {
    // single-action single-hop shape → the predicate-pushdown path (no eid
    // materialization); must match the generic path's semantics exactly
    val out = new GraftSession(spark, g).cypherUpdate(
      """MATCH (p:Person)-[r:LIVES_IN]->(c:City)
        |WHERE p.name = 'ann' AND c.name = 'rome' AND r.weight < 3.0
        |SET r.weight = r.weight + 100""".stripMargin)
    val w1 = out.edges.orderBy("src", "dst").select("weight").as[Double].collect().toSeq
    assert(w1 == Seq(1.0, 102.0, 3.0))
    // reversed arrow: (c)<-[r]-(p) must orient src/dst the same way
    val out2 = new GraftSession(spark, g).cypherUpdate(
      """MATCH (c:City)<-[r:LIVES_IN]-(p:Person)
        |WHERE p.name = 'ann' AND c.name = 'rome' AND r.weight < 3.0
        |SET r.weight = r.weight + 100""".stripMargin)
    val w2 = out2.edges.orderBy("src", "dst").select("weight").as[Double].collect().toSeq
    assert(w2 == w1)
    // DELETE through the same path, label-only anonymous endpoint
    val out3 = new GraftSession(spark, g).cypherUpdate(
      "MATCH (:Person)-[r:LIVES_IN]->(c:City) WHERE c.name = 'rome' DELETE r")
    assert(out3.edges.select("rel").as[String].collect().toSeq == Seq("KNOWS"))
  }
}
