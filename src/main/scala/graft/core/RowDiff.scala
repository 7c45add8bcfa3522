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
    diffTagged(a, b, bagExact = false).select(keys.map(col): _*).distinct()

  /** BOTH diff directions in ONE shuffle: the add rows are exactly
    * `antiRows(b, a)` (every copy, bag-exact) and the remove rows exactly
    * `antiRows(a, b)`, tagged in a `chg` column ("add" | "remove", first
    * column). Every two-directional consumer (epoch delta commits, change
    * data feeds, OCC write sets) previously paid two whole-row anti-joins —
    * four side-exchanges plus two joins; this is one tagged union, one
    * grouped count per canonical row, and a copy re-expansion:
    *
    *   union(a tagged (1,0), b tagged (0,1))
    *     groupBy canonical row → (nA, nB)
    *     nA = 0 → "add" × nB copies;  nB = 0 → "remove" × nA copies
    *
    * (a group with both sides present is an unchanged row — the anti-joins
    * emit nothing for it either, regardless of copy counts, because every
    * copy has a match.) Grouping keys are the same canonical encodings the
    * anti-join condition uses (maps via key-sorted JSON), and group-key null
    * handling matches `<=>`: null keys group together. Map columns ride
    * along as payload (any copy within a group carries a logically equal
    * map). Provably-empty sides short-circuit WITHOUT a shuffle — and keep
    * the analyzer's maxRows=0 proof when both sides are empty, which the
    * zero-job empty-side save (GraphIO.save) relies on.
    *
    * Falls back to the two anti-joins when a shared column's TYPE differs
    * between the sides — those outputs cannot union into one frame anyway.
    */
  def diffTagged(a: DataFrame, b: DataFrame, chgCol: String = "chg",
      addLabel: String = "add", removeLabel: String = "remove",
      bagExact: Boolean = true): DataFrame = {
    def tagAll(d: DataFrame, lbl: String): DataFrame =
      d.select(lit(lbl).as(chgCol) +: d.columns.map(col): _*)
    def viaAnti(): DataFrame = {
      val adds = antiRows(b, a)
      tagAll(adds, addLabel).unionByName(tagAll(antiRows(a, b), removeLabel))
    }
    val aEmpty = a.queryExecution.analyzed.maxRows.contains(0L)
    val bEmpty = b.queryExecution.analyzed.maxRows.contains(0L)
    val (l, r) = align(a, b)
    if (aEmpty || bEmpty) {
      // nothing to compare against: the non-empty side IS the diff (and two
      // empty sides stay a provably-empty frame — no job is ever scheduled)
      return tagAll(if (aEmpty) r else l.limit(0), addLabel)
        .unionByName(tagAll(if (bEmpty) l else r.limit(0), removeLabel))
    }
    val lT = l.schema.fields.map(f => f.name -> f.dataType).toMap
    val rT = r.schema.fields.map(f => f.name -> f.dataType).toMap
    if (l.columns.exists(c => lT(c) != rT(c))) return viaAnti()
    val cols = l.columns.toSeq
    val isMap = cols.map(c => c -> lT(c).isInstanceOf[MapType]).toMap
    def prep(d: DataFrame, na: Long, nb: Long) = d.select(
      cols.map(c => canonExpr(col(c), lT(c)).as(s"__dk_$c")) ++
        cols.filter(isMap).map(c => col(c).as(s"__dm_$c")) ++
        Seq(lit(na).as("__diffa__"), lit(nb).as("__diffb__")): _*)
    val aggs =
      Seq(sum("__diffa__").as("__diffa__"), sum("__diffb__").as("__diffb__")) ++
        cols.filter(isMap).map(c => first(col(s"__dm_$c")).as(s"__dm_$c"))
    val changed = prep(l, 1L, 0L).unionByName(prep(r, 0L, 1L))
      .groupBy(cols.map(c => col(s"__dk_$c")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("__diffa__") === 0 || col("__diffb__") === 0)
      .select(
        when(col("__diffa__") === 0, lit(addLabel)).otherwise(lit(removeLabel))
          .as(chgCol) +:
        greatest(col("__diffa__"), col("__diffb__")).cast("int").as("__diffn__") +:
        cols.map(c => col(if (isMap(c)) s"__dm_$c" else s"__dk_$c").as(c)): _*)
    // bagExact = antiRows parity (every input copy re-emitted); set mode
    // (bagExact = false) emits one row per distinct changed row — what a
    // downstream `.distinct()` would produce, minus its exchange
    (if (bagExact)
      changed.withColumn("__diffr__",
          explode(array_repeat(lit(true), col("__diffn__"))))
        .drop("__diffr__")
    else changed).drop("__diffn__")
  }
}
