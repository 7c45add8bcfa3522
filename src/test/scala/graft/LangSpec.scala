package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.frontends.graphql.GraphQLFrontend
import graft.frontends.gremlin.GremlinFrontend
import graft.graph.TpchGraph

class LangSpec extends AnyFunSuite {
  import TestSpark._

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))

  test("gremlin: count and sum aggregates") {
    val n = session.gremlin("g.V().hasLabel('Customer').count()")
      .collect().head.getLong(0)
    assert(n == spark.read.parquet(s"$sf/customer.parquet").count())
    val total = session.gremlin("g.V().hasLabel('Customer').sum('acctbal')")
      .collect().head.getDouble(0)
    assert(total != 0.0)
  }

  test("gremlin: within predicate and dedup") {
    val rows = session.gremlin(
      "g.V().hasLabel('Customer').has('category', within('BUILDING','AUTOMOBILE'))" +
        ".values('category').dedup().order().by()").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("AUTOMOBILE", "BUILDING"))
  }

  test("gremlin: parse errors") {
    assertThrows[IllegalArgumentException](GremlinFrontend.parseSteps("h.V()"))
    assertThrows[IllegalArgumentException](GremlinFrontend.parseSteps("g.V("))
    assertThrows[IllegalArgumentException](GremlinFrontend.translate("g.V().bogus()"))
  }

  test("graphql: scalar ids and parse errors") {
    val rows = session.graphql("""{ Region { id name } }""").collect()
    assert(rows.length == 5)
    assertThrows[IllegalArgumentException](GraphQLFrontend.parse("Region { name }"))
    assertThrows[IllegalArgumentException](GraphQLFrontend.parse("{ Region { name }"))
  }

  test("gql shares cypher surface") {
    val a = session.gql("MATCH (r:Region) RETURN r.name AS n ORDER BY n").collect()
    val b = session.cypher("MATCH (r:Region) RETURN r.name AS n ORDER BY n").collect()
    assert(a.map(_.getString(0)).toSeq == b.map(_.getString(0)).toSeq)
  }
}
