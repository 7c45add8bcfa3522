package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{In, Out, TpchGraph}

/** Factorized multi-hop aggregation (reference FactorizedChunk
  * factorized_chunk.rs:1-52, FactorizedAggregateOperator
  * factorized_aggregate.rs:229): the multiplicity recursion must equal the
  * flat materialize-then-aggregate plan on every (count, sum, direction)
  * combination — equality is the factorization proof.
  */
class FactorizedSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dag = TpchGraph.partDag(spark, sf)

  private def flatWalkCounts(hops: Int): Map[Long, (Long, Long)] = {
    val e = dag.edgesOfType("LINK").select(col("src"), col("dst"))
    var walks = e.select(col("src").as("id"), col("dst").as("cur"))
    for (_ <- 2 to hops)
      walks = walks.join(e.withColumnRenamed("src", "cur"), "cur")
        .select(col("id"), col("dst").as("cur"))
    walks.groupBy("id")
      .agg(count(lit(1)).as("walks"), sum(col("cur")).as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("3-hop count+sum equals the flat (materialized) plan") {
    val flat = flatWalkCounts(3)
    val fac = dag.factorizedWalkAgg(3, Seq("LINK"), sumProp = Some("id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fac == flat)
    assert(fac.nonEmpty)
  }

  test("count-only drops the total column and matches") {
    val flat = flatWalkCounts(2).view.mapValues(_._1).toMap
    val df = dag.factorizedWalkAgg(2, Seq("LINK"))
    assert(df.columns.toSeq == Seq("id", "walks"))
    val fac = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fac == flat)
  }

  test("direction In counts reverse walks") {
    // 1-hop In from node v counts its in-degree
    val indeg = dag.edgesOfType("LINK").groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fac = dag.factorizedWalkAgg(1, Seq("LINK"), dir = In)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fac == indeg)
  }

  test("sum of a node property over walk terminals") {
    // 1-hop with sumProp = "name": partDag names are the string id — not
    // summable; use the heterogeneous graph's acctbal over FROM_NATION... the
    // simplest property case: sum of terminal acctbal over 1-hop PLACED_BY
    // (order -> customer) equals the flat join aggregate.
    val g = TpchGraph(spark, sf)
    val flat = g.edgesOfType("PLACED_BY")
      .join(g.nodes.select(col("id").as("dst"), col("acctbal")), "dst")
      .groupBy(col("src").as("id"))
      .agg(sum(col("acctbal")).as("total"))
      .collect().map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    val fac = g.factorizedWalkAgg(1, Seq("PLACED_BY"), sumProp = Some("acctbal"))
      .collect().map(r => r.getLong(0) -> math.round(r.getDouble(2) * 100)).toMap
    assert(fac == flat)
  }
}
