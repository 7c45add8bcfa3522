package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.algos.Wcoj
import graft.graph.TpchGraph

/** Worst-case-optimal triangle join (reference leapfrog_join.rs /
  * leapfrog_integration.rs) — HyperCube cell locality and exact-set
  * equivalence with binary-join enumeration.
  */
class WcojSpec extends AnyFunSuite {
  import TestSpark._

  private def binaryJoinTriangles(edges: org.apache.spark.sql.DataFrame) = {
    val ue = edges.selectExpr("src AS u", "dst AS v")
      .union(edges.selectExpr("dst", "src")).filter(col("u") =!= col("v")).distinct()
    val x = ue.as("x"); val y = ue.as("y"); val z = ue.as("z")
    x.join(y, col("y.u") === col("x.v"))
      .join(z, col("z.u") === col("y.v") && col("z.v") === col("x.u"))
      .filter(col("x.u") < col("x.v") && col("x.v") < col("y.v"))
      .select(col("x.u").as("a"), col("x.v").as("b"), col("y.v").as("c"))
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("K4 yields its four triangles exactly once each") {
    val edges = spark.createDataFrame(Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .toDF("src", "dst")
    val got = Wcoj.triangles(edges, shares = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.distinct.length, "no duplicate triangles")
    assert(got.toSet == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("matches binary-join enumeration across shares (cell-collision regimes)") {
    val edges = TpchGraph.partDag(spark, sf).edges
    val expected = asSet(binaryJoinTriangles(edges))
    assert(expected.nonEmpty)
    for (shares <- Seq(1, 2, 3)) {
      val got = Wcoj.triangles(edges, shares)
      assert(got.count() == expected.size, s"shares=$shares cardinality")
      assert(asSet(got) == expected, s"shares=$shares set equality")
    }
  }

  test("plan never joins edges against edges — no wedge materialization") {
    // the only joins in a WCOJ plan are the broadcast replication against
    // the tiny `shares` range; an edge⋈edge equi-join (the wedge set a
    // binary-join plan shuffles, quadratic in max degree) must not appear
    val p = Wcoj.triangles(TpchGraph.partDag(spark, sf).edges, shares = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), s"wedge join leaked into the plan:\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"wedge join leaked into the plan:\n$p")
  }
}
