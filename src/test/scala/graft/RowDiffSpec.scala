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

  test("diffTagged ≡ the antiRows pair (r18 one-shuffle rewrite)") {
    // duplicates on purpose: (9,"dup") twice in a, absent in b (remove ×2);
    // (8,"new") twice in b, absent in a (add ×2); (7,"both") duplicated in
    // a AND present once in b (matched — no diff rows, like the anti-joins)
    val a = Seq((1L, "keep"), (2L, "old"), (7L, "both"), (7L, "both"),
      (9L, "dup"), (9L, "dup")).toDF("id", "v")
    val b = Seq((1L, "keep"), (2L, "new"), (7L, "both"),
      (8L, "new"), (8L, "new")).toDF("id", "v")
    val got = RowDiff.diffTagged(a, b)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val adds = RowDiff.antiRows(b, a)
      .collect().map(r => ("add", r.getLong(0), r.getString(1)))
    val removes = RowDiff.antiRows(a, b)
      .collect().map(r => ("remove", r.getLong(0), r.getString(1)))
    assert(got == (adds ++ removes).sorted.toSeq,
      "bag-exact parity with the two anti-joins, copies included")
    // set emission = what a downstream .distinct() would produce
    assert(RowDiff.diffTagged(a, b, bagExact = false).count() ==
      got.distinct.size)
  }

  test("diffTagged: map columns and empty sides") {
    val a = Seq((1L, Map("k" -> "v")), (2L, Map("x" -> "y")))
      .toDF("id", "props")
    val b = Seq((1L, Map("k" -> "v")), (2L, Map("x" -> "CHANGED")))
      .toDF("id", "props")
    val d = RowDiff.diffTagged(a, b).collect()
    assert(d.length == 2 && d.forall(_.getLong(1) == 2L),
      "only the changed-map row diffs, in both directions")
    // provably-empty side: the other side IS the diff, and the plan stays
    // shuffle-free (no Exchange at all)
    val empty = a.limit(0)
    val addsOnly = RowDiff.diffTagged(empty, b)
    assert(addsOnly.collect().forall(_.getString(0) == "add") &&
      addsOnly.count() == 2)
    assert(!addsOnly.queryExecution.executedPlan.toString.contains("Exchange"),
      "empty-side short-circuit must not shuffle")
    // both sides empty keeps the analyzer's maxRows=0 proof (zero-job saves)
    assert(RowDiff.diffTagged(empty, b.limit(0))
      .queryExecution.analyzed.maxRows.contains(0L))
  }

  test("diffTagged plans ONE exchange (vs four for the anti-join pair)") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((1L, "x"), (3L, "z")).toDF("id", "v")
    val n = RowDiff.diffTagged(a, b).queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Exchange"))
    assert(n <= 1, s"grouped diff must shuffle once, planned $n exchanges")
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
