package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.RowDiff

/** Direct pins for the whole-row diff primitive every OCC validation and
  * CDC feed is built on — the three documented fixes over a plain
  * name-list anti-join (map columns, schema evolution, null semantics)
  * plus the r16 type-change canonicalization.
  */
class RowDiffSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("rows with nulls match themselves (null-safe equality)") {
    val a = Seq((1L, Some("x")), (2L, None)).toDF("id", "v")
    val b = Seq((1L, Some("x")), (2L, None)).toDF("id", "v")
    assert(RowDiff.antiRows(a, b).isEmpty && RowDiff.antiRows(b, a).isEmpty)
    assert(RowDiff.changedKeys(a, b, Seq("id")).isEmpty)
  }

  test("map-typed columns compare by content, not reference") {
    val a = Seq((1L, Map("k" -> "v", "j" -> "w"))).toDF("id", "props")
    val b = Seq((1L, Map("j" -> "w", "k" -> "v"))).toDF("id", "props")
    assert(RowDiff.antiRows(a, b).isEmpty, "entry order must not matter")
    val c = Seq((1L, Map("k" -> "OTHER", "j" -> "w"))).toDF("id", "props")
    assert(RowDiff.changedKeys(a, c, Seq("id")).count() == 1)
  }

  test("schema evolution: a column on one side only diffs where values differ") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((1L, "x", Some(5L)), (2L, "y", None)).toDF("id", "v", "extra")
    // row 2's extra is null on both (padded left vs real null right) → same;
    // row 1 gained extra=5 → changed
    assert(RowDiff.changedKeys(a, b, Seq("id"))
      .as[Long].collect().toSet == Set(1L))
  }

  test("a re-typed column diffs even when values coerce equal") {
    // double 20.0 vs string "20.0": plain comparison coerces them equal and
    // the type change vanishes (OCC under-detection); the type-tagged JSON
    // canonicalization must flag the row as changed
    val a = Seq((1L, 20.0), (2L, 30.0)).toDF("id", "score")
    val b = Seq((1L, "20.0"), (2L, "30.5")).toDF("id", "score")
    assert(RowDiff.changedKeys(a, b, Seq("id"))
      .as[Long].collect().toSet == Set(1L, 2L),
      "both rows changed: every value was re-typed")
    // and same-typed sides still compare by value
    val c = Seq((1L, 20.0), (2L, 30.5)).toDF("id", "score")
    assert(RowDiff.changedKeys(a, c, Seq("id"))
      .as[Long].collect().toSet == Set(2L))
  }
}
