package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{L, TriplePattern, TripleGraph, V}

/** The delta change sets from modifyWithDelta must prune the STORE side of
  * their presence joins by the templates' literal terms (r17): the filter
  * is answer-preserving (instantiated rows carry exactly those literals)
  * and turns the per-commit full-store shuffle into a pushed-down matched
  * slice — the epoch family's decade-curve fix.
  */
class ModifyDeltaPlanSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("adds/removes join sides carry the template literals as pushed filters") {
    val path = java.nio.file.Files.createTempDirectory("graft_mdp").toString
    val t = Seq(("c:1", "segment", "BUILDING"), ("c:2", "segment", "AUTO"),
      ("c:3", "other", "BUILDING")).toDF("s", "p", "o")
    t.write.parquet(s"$path/t")
    val g = TripleGraph(spark.read.parquet(s"$path/t"))
    val (_, adds, removes) = g.modifyWithDelta(
      where = Seq(TriplePattern(V("c"), L("segment"), L("BUILDING"))),
      deleteTpl = Seq(TriplePattern(V("c"), L("segment"), L("BUILDING"))),
      insertTpl = Seq(TriplePattern(V("c"), L("segment"), L("RETAIL"))))
    // values first: the exact change sets
    assert(adds.collect().map(_.toSeq).toSet == Set(Seq("c:1", "segment", "RETAIL")))
    assert(removes.collect().map(_.toSeq).toSet == Set(Seq("c:1", "segment", "BUILDING")))
    // plan shape: every parquet scan in the join lineages carries pushed
    // filters on the literal positions (no unfiltered full-store scan
    // feeding a join side)
    def pushed(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metadata.getOrElse("PushedFilters", "")
      }
    assert(pushed(adds).forall(_.contains("EqualTo")),
      s"adds scans must all be literal-pruned: ${pushed(adds)}")
    assert(pushed(removes).forall(_.contains("EqualTo")),
      s"removes scans must all be literal-pruned: ${pushed(removes)}")
  }
}
