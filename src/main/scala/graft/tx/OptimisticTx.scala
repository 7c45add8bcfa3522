package graft.tx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import graft.sources.GraphIO.Epochs

/** Optimistic concurrency control for epoch commits (reference
  * TransactionManager, transaction/manager.rs:208-330): a transaction
  * begun at epoch `base` commits only if no epoch published after `base`
  * touched the same entities.
  *
  * - **Write-write** (all isolation levels): this transaction's write set
  *   vs the write sets of every epoch in `(base, head]`.
  * - **Read-write / SSI** (serializable only): the transaction's
  *   explicitly recorded read set (the reference's `record_read` is
  *   likewise explicit, manager.rs:190) vs those same later write sets.
  *
  * Entities are node ids and edge `(src, dst, rel)` keys; write sets are
  * symmetric row diffs projected to entity keys — every check is a
  * DataFrame anti/semi-join, so validation distributes and never collects
  * a corpus to the driver. The check+publish pair is serialized in-JVM
  * (same scope as the reference's in-process manager).
  */
object OptimisticTx {

  sealed trait Isolation
  /** Write-write detection only (default, manager.rs "All isolation levels"). */
  case object Snapshot extends Isolation
  /** Write-write + read-write SSI validation (manager.rs "Serializable only"). */
  case object Serializable extends Isolation

  final class WriteConflictException(msg: String) extends RuntimeException(msg)
  final class ReadConflictException(msg: String) extends RuntimeException(msg)

  /** serializes conflict-check + publish so a concurrent in-JVM commit
    * cannot slip between validation and the epoch claim */
  private val commitLock = new Object

  /** Changed-entity keys between two graph states: node ids and edge
    * (src, dst, rel) keys appearing in the symmetric row difference —
    * a property rewrite shows up in both sides' anti-joins, an insert or
    * delete in one. Delegates to [[graft.core.RowDiff]], so a change to a
    * schemaless map property, a brand-new typed column, or a row carrying
    * nulls all diff correctly (plain whole-row anti-joins would miss the
    * first, throw on the second, and over-report the third).
    */
  def writeSet(before: PropertyGraph, after: PropertyGraph): (DataFrame, DataFrame) =
    (graft.core.RowDiff.changedKeys(before.nodes, after.nodes, Seq("id")),
      graft.core.RowDiff.changedKeys(before.edges.drop("eid"),
        after.edges.drop("eid"), Seq("src", "dst", "rel")))

  private def nonEmpty(df: DataFrame): Boolean = !df.isEmpty

  /** Validate `staged` (begun at epoch `base`) against every epoch
    * committed after `base`, then publish it as the next epoch. Returns
    * the new epoch number; throws [[WriteConflictException]] /
    * [[ReadConflictException]] on validation failure (the transaction's
    * effects are NOT published — the caller may retry from the new head).
    *
    * `readNodes` / `readEdges` are the recorded read set (entity keys),
    * consulted only at [[Serializable]].
    */
  def commitChecked(spark: SparkSession, path: String, base: Long,
      baseGraph: PropertyGraph, staged: PropertyGraph,
      isolation: Isolation = Snapshot,
      readNodes: Option[DataFrame] = None,
      readEdges: Option[DataFrame] = None,
      trackedWriteSet: Option[(DataFrame, DataFrame)] = None): Long = commitLock.synchronized {
    val epochs = Epochs.list(spark, path)
    val head = epochs.lastOption.getOrElse(
      throw new IllegalStateException(s"no committed epoch at $path"))
    // compact (WAL-checkpoint truncation, reference wal/mod.rs:1-14) prunes
    // every epoch before the folded head — sidecars included, because they
    // live inside `e<N>/`. A transaction whose BASE was pruned cannot
    // validate: the interval (base, head] is no longer enumerable (the
    // folded epoch records no write set and the snapshot-diff fallback
    // would need asOf(base), which is gone). That is a retryable conflict
    // with the store's history, not a crash: surface it as the same
    // exception a write-write conflict raises, so callers' retry loops
    // rebase on the current head exactly as they would after losing a race.
    if (!epochs.contains(base))
      throw new WriteConflictException(
        s"base epoch $base was pruned (compact ran since this transaction " +
          s"began); retry from the current head $head")
    var toPublish = staged
    var publishedWriteSet: Option[DataFrame] = None
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // `trackedWriteSet`: touched-entity keys the TRANSACTION recorded as it
    // staged (the reference's record_write model) — a conservative superset
    // of the base-vs-staged diff, so validation stays sound (over-detects,
    // never under-detects) and the merge-publish routes identical rows for
    // keys that were touched but unchanged. With it, NO path here ever
    // diffs two corpus snapshots to learn what this transaction wrote.
    //
    // NO dedup anywhere on these key frames (r17): every consumer —
    // validation overlap, merge anti/semi joins, the sidecar readers — is
    // a semi/anti join, for which key multiplicity changes nothing, while
    // the r16 `.distinct()` pair planned a shuffle each and cost two extra
    // AQE stage jobs per commit (the measured q_tx_conflict regression).
    def myFlat(): DataFrame =
      trackedWriteSet.map { case (n, e) => Epochs.flatKeys(n, e) }
        .getOrElse {
          val (n, e) = writeSet(baseGraph, staged)
          Epochs.flatKeys(n, e)
        }
    // the try/finally spans VALIDATION too, not just the publish: a
    // write-write conflict throws after `mine` is persisted, and leaving
    // it cached leaked one tiny key frame per aborted commit (executor
    // storage that only a driver GC would eventually reclaim)
    try {
    if (head > base) {
      // the key frame is consumed up to four times on this path (the
      // validation semi-join, the merge's anti+semi joins ×2 kinds, the
      // sidecar write) — cache ONE flat frame; coalesce(1) first because
      // a cached plan keeps its partitioning and entity-key frames are
      // tiny relative to the work of recomputing them
      val mine = myFlat().coalesce(1).persist()
      cached += mine
      // the per-kind faces of the SAME cached frame: narrow filters, no
      // recompute, no second cache
      val myNodes = mine.filter(col("kind") === "n").select("id")
      val myEdges = mine.filter(col("kind") === "e").select("src", "dst", "rel")
      // entities touched by ANY later epoch: prefer each epoch's recorded
      // write-set keys (the OCC sidecar a contended merge-publish leaves
      // behind, or a delta epoch's own change rows) — O(changed keys) —
      // falling back to the one-pass snapshot diff of the whole interval
      // only when some epoch in it is a plain full commit that recorded
      // nothing. At corpus scale the sidecar path is what keeps commit
      // validation from re-scanning the store.
      val later = epochs.filter(e => e > base && e <= head)
      val sidecars = later.map(e => Epochs.epochFlatWriteSet(spark, path, e))
      val theirs =
        if (sidecars.forall(_.isDefined)) sidecars.flatten.reduce(_ unionByName _)
        else {
          val (n, e) = writeSet(Epochs.asOf(spark, path, base),
            Epochs.asOf(spark, path, head))
          Epochs.flatKeys(n, e)
        }
      // one overlap pass for BOTH kinds (two sequential isEmpty actions
      // were two scheduler round-trips for one boolean each): both sides
      // already in the flat sidecar layout, null-safe-join on all key
      // columns — kinds can't cross-match ('n' rows never equal 'e' rows)
      locally {
        val m = mine.alias("m")
        val t = theirs.alias("t")
        val on = col("m.kind") === col("t.kind") &&
          col("m.id") <=> col("t.id") && col("m.src") <=> col("t.src") &&
          col("m.dst") <=> col("t.dst") && col("m.rel") <=> col("t.rel")
        val hitKinds = m.join(t, on, "left_semi")
          .select("kind").distinct().collect().map(_.getString(0)).toSet
        if (hitKinds("n"))
          throw new WriteConflictException(
            s"write-write conflict: epochs ($base, $head] touched nodes this transaction also wrote")
        if (hitKinds("e"))
          throw new WriteConflictException(
            s"write-write conflict: epochs ($base, $head] touched edges this transaction also wrote")
      }
      if (isolation == Serializable) {
        val theirNodes = theirs.filter(col("kind") === "n").select("id")
        val theirEdges = theirs.filter(col("kind") === "e").select("src", "dst", "rel")
        readNodes.foreach { rn =>
          if (nonEmpty(rn.select(col(rn.columns.head).as("id")).distinct()
              .join(theirNodes, Seq("id"), "left_semi")))
            throw new ReadConflictException(
              s"read-write conflict: epochs ($base, $head] wrote nodes this transaction read")
        }
        readEdges.foreach { re =>
          if (nonEmpty(re.join(theirEdges, Seq("src", "dst", "rel"), "left_semi")))
            throw new ReadConflictException(
              s"read-write conflict: epochs ($base, $head] wrote edges this transaction read")
        }
      }
      // Validation passed ⇒ the later epochs' changes are disjoint from this
      // transaction's writes. Publishing the stale staged snapshot wholesale
      // would silently revert them, so merge at entity granularity instead:
      // the head state everywhere EXCEPT this transaction's write set, which
      // takes the staged rows (absence there = a delete). The per-entity
      // version-chain merge of the reference's MVCC, as two join passes.
      val headGraph = Epochs.asOf(spark, path, head)
      toPublish = PropertyGraph(
        headGraph.nodes.join(myNodes, Seq("id"), "left_anti")
          .unionByName(staged.nodes.join(myNodes, Seq("id"), "left_semi"),
            allowMissingColumns = true),
        headGraph.edges.join(myEdges, Seq("src", "dst", "rel"), "left_anti")
          .unionByName(
            staged.edges.drop("eid").join(myEdges, Seq("src", "dst", "rel"), "left_semi"),
            allowMissingColumns = true))
      publishedWriteSet = Some(mine)
    } else trackedWriteSet.foreach { _ =>
      // uncontended commit with TRACKED keys: the write set cost nothing
      // to learn (no diff ran), so always leave the sidecar — the next
      // transaction in any contention chain then validates against
      // O(changed keys) instead of a corpus snapshot diff. (Without
      // tracking, recording here would require a base-vs-staged diff per
      // quiet commit, which measured strictly worse — that path still
      // skips the sidecar.) Consumed exactly once (the sidecar write),
      // so no persist — and with no dedup the whole sidecar is ONE
      // shuffle-free write job.
      publishedWriteSet = Some(myFlat())
    }
    // the write set is already in hand — publish it as the epoch's sidecar
    // so the NEXT transaction in the chain validates against keys instead
    // of a corpus diff. The keys are a conservative superset of the
    // published change (staged rows equal to the head's count as written)
    // — safe for OCC, which may only over-detect, never under-detect. The
    // sidecar rides the commit's own write wave BEFORE publish: if it
    // fails, the commit fails unpublished (safe retry), and validators
    // fall back to the snapshot diff only for epochs that genuinely have
    // no committed sidecar.
    publishedWriteSet match {
      case Some(flat) => Epochs.commitWithWriteSet(toPublish, path, flat)
      case None       => Epochs.commit(toPublish, path)
    }
    } finally cached.foreach(_.unpersist())
  }
}
