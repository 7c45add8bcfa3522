package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.TpchGraph

/** Session plan cache (reference QueryCache, query/cache.rs:1-60): repeated
  * query strings reuse the translated+compiled plan; distinct parameter
  * bindings are distinct plans; results are unchanged either way.
  */
class PlanCacheSpec extends AnyFunSuite {
  import TestSpark._

  test("repeated cypher text hits the cache and returns the same results") {
    val session = new GraftSession(spark, TpchGraph(spark, sf))
    val q = "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) RETURN n.name AS nat, count(*) AS cnt ORDER BY nat"
    val first = session.cypher(q).collect()
    assert(session.planCacheStats == (0L, 1L))
    val second = session.cypher(q).collect()
    assert(session.planCacheStats == (1L, 1L))
    assert(first.toSeq == second.toSeq)
  }

  test("distinct parameter bindings are distinct cached plans") {
    val session = new GraftSession(spark, TpchGraph(spark, sf))
    val q = "MATCH (n:Nation) WHERE n.name = $nm RETURN n.name AS nm"
    val a = session.cypher(q, Map("nm" -> "NATION_3")).collect()
    val b = session.cypher(q, Map("nm" -> "NATION_5")).collect()
    assert(session.planCacheStats == (0L, 2L), "different bindings must not share a plan")
    assert(a.map(_.getString(0)).toSeq == Seq("NATION_3"))
    assert(b.map(_.getString(0)).toSeq == Seq("NATION_5"))
    // same binding again is a hit
    session.cypher(q, Map("nm" -> "NATION_3"))
    assert(session.planCacheStats == (1L, 2L))
  }

  test("all read front-ends route through the cache") {
    val session = new GraftSession(spark, TpchGraph(spark, sf))
    session.gremlin("g.V().hasLabel('Region').count()")
    session.gremlin("g.V().hasLabel('Region').count()")
    session.graphql("{ Region { name } }")
    session.graphql("{ Region { name } }")
    session.gql("MATCH (r:Region) RETURN r.name AS nm")
    session.gql("MATCH (r:Region) RETURN r.name AS nm")
    assert(session.planCacheStats == (3L, 3L))
  }

  test("SPARQL sessions cache translated plans too (fifth front-end)") {
    import spark.implicits._
    val tg = graft.graph.TripleGraph(
      Seq(("s1", "p1", "o1"), ("s2", "p1", "o2"), ("s1", "p2", "o3"))
        .toDF("s", "p", "o"))
    val session = new graft.frontends.sparql.SparqlSession(tg)
    val q = "SELECT ?s WHERE { ?s p1 ?o } ORDER BY ?s"
    val first = session.query(q).collect()
    assert(session.planCacheStats == (0L, 1L))
    val second = session.query(q).collect()
    assert(session.planCacheStats == (1L, 1L))
    assert(first.toSeq == second.toSeq && first.length == 2)
    // a distinct query string is a distinct plan
    session.query("SELECT ?s WHERE { ?s p2 ?o }")
    assert(session.planCacheStats == (1L, 2L))
  }

  test("cache is bounded LRU: evicted entries recompile") {
    val c = new graft.core.PlanCache[java.lang.Integer](capacity = 2)
    var computes = 0
    def get(k: String): Int = c.get(k) { computes += 1; Integer.valueOf(computes) }
    get("a"); get("b"); get("a") // a is most-recent
    get("c")                     // evicts b
    assert(c.size == 2)
    get("b")                     // recompile
    assert(computes == 4)
    assert(c.hits == 1L && c.misses == 4L)
  }

  test("a mutated graph is a new session with a fresh cache (no staleness)") {
    val session = new GraftSession(spark, TpchGraph(spark, sf))
    val q = "MATCH (r:Region) RETURN count(*) AS n"
    val before = session.cypher(q).collect().head.getLong(0)
    val mutated = session.cypherUpdate("CREATE (:Region {id: 999999001, name: 'ATLANTIS'})")
    val session2 = new GraftSession(spark, mutated)
    val after = session2.cypher(q).collect().head.getLong(0)
    assert(after == before + 1)
    assert(session2.planCacheStats == (0L, 1L), "new session starts cold")
    // the old session still answers from its snapshot — reference MVCC view
    assert(session.cypher(q).collect().head.getLong(0) == before)
  }
}
