package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{PropertyGraph, TpchGraph}

/** The single-node row-local SET fast path (r17,
  * CypherUpdates.pushdownNodeSet): the mutation must compile to a
  * conditional projection — NO join, NO shuffle in the mutated nodes plan —
  * and must stay value-identical to the generic flag-join path on every
  * supported shape, falling back (with a join) on unsupported ones.
  */
class NodeSetPushdownSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val g = TpchGraph(spark, sf)

  private def hasJoin(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Join => true
      case _ => false
    }

  private def run(q: String): PropertyGraph =
    graft.frontends.cypher.CypherUpdates.runTracked(spark, g, q)._1

  test("row-local MATCH..SET compiles join-free and tracks a filter write set") {
    val (out, touched) = graft.frontends.cypher.CypherUpdates.runTracked(spark, g,
      "MATCH (c:Customer) WHERE c.acctbal > 5000.0 SET c.category = 'VIP'")
    assert(!hasJoin(out.nodes), "fast path must be a conditional projection")
    val (tn, te) = touched.get
    assert(!hasJoin(tn), "tracked write set must be a filter projection")
    assert(te.isEmpty, "node-only SET touches no edges")
    // values: identical to evaluating the predicate directly
    val expected = g.nodes
      .filter(array_contains(col("labels"), "Customer") && col("acctbal") > 5000.0)
      .count()
    assert(tn.count() == expected)
    assert(out.nodes.filter(col("category") === "VIP").count() >= expected)
  }

  test("multiple SET items fold in order over one projection") {
    val out = run(
      "MATCH (c:Customer) WHERE c.acctbal > 5000.0 SET c.acctbal = c.acctbal * 2, c.category = 'VIP'")
    assert(!hasJoin(out.nodes))
    val hi = out.nodes.filter(col("category") === "VIP")
    val base = g.nodes.filter(array_contains(col("labels"), "Customer") &&
      col("acctbal") > 5000.0)
    assert(hi.count() == base.count())
    // doubled: min of mutated VIP balances == 2 x min of matched originals
    val mo = base.agg(min("acctbal")).collect().head.getDouble(0)
    val mm = hi.agg(min("acctbal")).collect().head.getDouble(0)
    assert(math.abs(mm - 2 * mo) < 1e-9)
  }

  test("earlier item rewriting a WHERE column does not un-match later items") {
    // The match flag must be materialized from PRE-mutation values: setting
    // acctbal = 0.0 first must not stop category = 'VIP' from applying
    // (r17 ADVICE high finding).
    val out = run(
      "MATCH (c:Customer) WHERE c.acctbal > 5000.0 SET c.acctbal = 0.0, c.category = 'VIP'")
    assert(!hasJoin(out.nodes), "still the join-free fast path")
    val expected = g.nodes.filter(array_contains(col("labels"), "Customer") &&
      col("acctbal") > 5000.0).count()
    assert(expected > 0)
    val vips = out.nodes.filter(col("category") === "VIP")
    assert(vips.count() == expected, "later SET item must apply to all matched rows")
    assert(vips.filter(col("acctbal") =!= 0.0).count() == 0)
    // and the generic path agrees value-for-value
    val generic = graft.graph.Mutations.setNodeFieldsByIds(g,
      g.nodes.filter(array_contains(col("labels"), "Customer") &&
        col("acctbal") > 5000.0).select(col("id")),
      Seq("acctbal" -> lit(0.0), "category" -> lit("VIP")))
    assert(generic.nodes.filter(col("category") === "VIP").count() == expected)
  }

  test("unsupported shapes fall back to the generic flag-join path") {
    // expansion in the pattern -> generic
    val out1 = run(
      "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) SET c.category = 'X'")
    assert(hasJoin(out1.nodes), "multi-entity match requires the id join")
    // id rewrite -> generic (identity change is untrackable as a filter)
    val out2 = run("MATCH (r:Region) SET r.id = r.id + 1000000")
    assert(hasJoin(out2.nodes))
    // both still produce correct values
    assert(out1.nodes.filter(col("category") === "X").count() ==
      g.nodes.filter(array_contains(col("labels"), "Customer")).count())
  }

  test("inline props and multi-conjunct WHERE stay join-free; IS NULL falls back") {
    val out = run(
      "MATCH (c:Customer {category: 'BUILDING'}) WHERE c.acctbal > -10000.0 AND c.acctbal < 100000.0 SET c.category = 'SMALL'")
    assert(!hasJoin(out.nodes))
    val n = out.nodes.filter(col("category") === "SMALL").count()
    val expected = g.nodes.filter(array_contains(col("labels"), "Customer") &&
      col("category") === "BUILDING" &&
      col("acctbal") > -10000.0 && col("acctbal") < 100000.0).count()
    assert(n == expected && n > 0)
    // IS NULL routes through Expr.IsNull (outside the row-local translator)
    val out2 = run("MATCH (c:Customer) WHERE c.category IS NULL SET c.category = 'N'")
    assert(hasJoin(out2.nodes), "IS NULL keeps the generic path")
  }
}
