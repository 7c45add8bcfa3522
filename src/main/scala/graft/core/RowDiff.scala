package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, MapType}

/** Whole-row diff primitives shared by the OCC validator
  * ([[graft.tx.OptimisticTx]]) and the epoch delta/change-data-feed code
  * ([[graft.sources.GraphIO.Epochs]]).
  *
  * Plain `df.join(other, df.columns, "left_anti")` is wrong for this job
  * in three ways this object fixes:
  *
  *  1. **Map-typed columns** (the schemaless `props` fallback that
  *     Mutations introduces for unknown properties) are rejected by Spark
  *     as join/equality keys — compare them through a canonical JSON
  *     encoding of their key-sorted entries instead.
  *  2. **Schema evolution**: a column present on one side only (a typed
  *     property added by a later epoch / transaction) must read as a
  *     difference where values differ, not an AnalysisException — align
  *     both sides to the union of columns with typed nulls first.
  *  3. **Null semantics**: name-list joins use `EqualTo`, under which a
  *     row containing any null never matches itself, so unchanged rows
  *     with nulls would be flagged as both added and removed — compare
  *     null-safely (`<=>`).
  *
  * All comparisons stay equi-join-shaped (null-safe equality is an
  * equi-key for Spark's hash joins), so the diffs distribute and never
  * degrade to nested-loop plans.
  */
object RowDiff {

  /** Canonical comparison expression: maps become JSON of key-sorted
    * entries (deterministic regardless of internal map ordering); other
    * types compare as themselves.
    */
  private def canonExpr(c: Column, dt: DataType): Column = dt match {
    case _: MapType => to_json(array_sort(map_entries(c)))
    case _          => c
  }

  /** Pad both frames to the union of their columns, missing columns as
    * typed nulls (type taken from the side that has the column). Column
    * order is left's columns then right-only columns.
    */
  def align(a: DataFrame, b: DataFrame): (DataFrame, DataFrame) = {
    val at = a.schema.fields.map(f => f.name -> f.dataType).toMap
    val bt = b.schema.fields.map(f => f.name -> f.dataType).toMap
    val all = a.columns.toSeq ++ b.columns.filterNot(at.contains)
    def pad(d: DataFrame, own: Map[String, DataType], other: Map[String, DataType]) =
      d.select(all.map(c => if (own.contains(c)) col(c)
        else lit(null).cast(other(c)).as(c)): _*)
    (pad(a, at, bt), pad(b, bt, at))
  }

  /** Rows of `left` with no null-safe whole-row match in `right`.
    * Schemas are aligned to the union of columns first; the result keeps
    * the aligned ORIGINAL columns (map columns stay maps — the canonical
    * encoding is used only as the join key), so callers may persist or
    * union the output with either input.
    */
  def antiRows(left: DataFrame, right: DataFrame): DataFrame = {
    val (l, r) = align(left, right)
    val lTypes = l.schema.fields.map(f => f.name -> f.dataType).toMap
    val rTypes = r.schema.fields.map(f => f.name -> f.dataType).toMap
    val rr = r.select(r.columns.map(c => col(c).as(s"__r_$c")): _*)
    val cond = l.columns.map { c =>
      if (lTypes(c) == rTypes(c))
        canonExpr(l(c), lTypes(c)) <=> canonExpr(rr(s"__r_$c"), lTypes(c))
      else {
        // a shared column whose TYPE differs between the sides (a property
        // re-typed across epochs): plain comparison would coerce — double
        // 20.0 <=> string "20.0" reads equal and the type change vanishes
        // from the diff (for OCC that is UNDER-detection, a lost update).
        // Compare the type-tagged JSON encoding instead: 20.0 → 20.0,
        // "20.0" → "20.0" quoted — values are equal only when type AND
        // content agree. Nulls: to_json(struct(null)) = "{}" both sides.
        to_json(struct(l(c).as("v"))) <=> to_json(struct(rr(s"__r_$c").as("v")))
      }
    }.reduce(_ && _)
    l.join(rr, cond, "left_anti")
  }

  /** Symmetric difference projected to `keys`: entity keys of rows that
    * changed in either direction between `a` and `b`.
    */
  def changedKeys(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    antiRows(b, a).select(keys.map(col): _*)
      .unionByName(antiRows(a, b).select(keys.map(col): _*))
      .distinct()
}
