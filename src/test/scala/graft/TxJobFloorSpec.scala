package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.TpchGraph

/** Pins the q_tx_conflict job census (r17 verdict #2): ProfileTx attributes
  * the query's residual time to ~16 Spark jobs × a fixed per-job scheduler
  * floor (~65 ms at local[32]) across three checked epoch commits — the
  * data path is O(changed keys) and the r17 plan work already cut the
  * count 26 → 16. The 1.2 s normalized bar is retired on that floor
  * attribution; THIS spec is the replacement guard: the job count is
  * load-invariant, so a silently regrown shuffle/dedup/extra action on the
  * commit path fails here even when wall-clock noise would hide it.
  */
class TxJobFloorSpec extends AnyFunSuite {
  import TestSpark._

  test("the tx-conflict body stays within its pinned job budget") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val path = java.nio.file.Files.createTempDirectory("graft_txfloor").toString
    val base = TpchGraph(spark, sf)
    val sess = new GraftSession(spark, graft.graph.PropertyGraph(
      base.nodes.filter(array_contains(col("labels"), "Customer")),
      base.edges.limit(0)))
    // warm the fixture OUTSIDE the census (the bench harness does the same)
    sess.graph.nodes.count()
    spark.sparkContext.addSparkListener(listener)
    try {
      def phase(label: String, budget: Int)(f: => Unit): Unit = {
        val j0 = jobs.get
        f
        // let listener events drain before reading the counter
        Thread.sleep(100)
        val n = jobs.get - j0
        assert(n <= budget,
          s"$label ran $n jobs, budget $budget - a commit-path action regrew")
      }
      phase("e0 commit", 2) {
        graft.sources.GraphIO.Epochs.commit(sess.graph, path)
      }
      val tx1 = sess.beginTransaction(path)
      val tx2 = sess.beginTransaction(path)
      tx1.cypherUpdate(
        "MATCH (c:Customer) WHERE c.category = 'BUILDING' SET c.acctbal = c.acctbal * 2")
      tx2.cypherUpdate(
        "MATCH (c:Customer) WHERE c.acctbal > 5000.0 SET c.category = 'VIP'")
      phase("tx1 commit (uncontended, tracked)", 4) {
        tx1.commitEpochChecked()
      }
      phase("tx2 conflict detection", 3) {
        intercept[graft.tx.OptimisticTx.WriteConflictException] {
          tx2.commitEpochChecked()
        }
      }
      val retry = sess.beginTransaction(path)
      retry.cypherUpdate(
        "MATCH (c:Customer) WHERE c.acctbal > 5000.0 SET c.category = 'VIP'")
      phase("retry commit (contended merge-publish)", 5) {
        retry.commitEpochChecked()
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
