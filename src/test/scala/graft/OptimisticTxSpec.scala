package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import graft.tx.OptimisticTx

/** Optimistic concurrency over the epoch store (reference
  * transaction/manager.rs:208-330): write-write conflicts abort at every
  * isolation level; read-write (SSI) conflicts abort only at Serializable.
  */
class OptimisticTxSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshStore(): (GraftSession, String) = {
    val nodes = Seq(
      (1L, Seq("Person"), "ann", 10.0), (2L, Seq("Person"), "bob", 20.0),
      (3L, Seq("Person"), "cat", 30.0)
    ).toDF("id", "labels", "name", "score")
    val edges = Seq((1L, 2L, "KNOWS", 1.0)).toDF("src", "dst", "rel", "weight")
    val g = PropertyGraph(nodes, edges)
    val path = java.nio.file.Files.createTempDirectory("graft_otx").toString
    graft.sources.GraphIO.Epochs.commit(g, path)
    (new GraftSession(spark, g), path)
  }

  test("write-write conflict on the same node aborts the second committer") {
    val (sess, path) = freshStore()
    val tx1 = sess.beginTransaction(path)
    val tx2 = sess.beginTransaction(path)
    tx1.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 11.0")
    tx2.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 99.0")
    tx1.commitEpochChecked()
    val e = intercept[OptimisticTx.WriteConflictException](tx2.commitEpochChecked())
    assert(e.getMessage.contains("write-write"))
    // retry from the new head succeeds and sees tx1's write underneath
    val tx3 = sess.beginTransaction(path)
    tx3.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 99.0")
    val e3 = tx3.commitEpochChecked()
    val g = graft.sources.GraphIO.Epochs.asOf(spark, path, e3)
    assert(g.nodes.filter(col("name") === "ann")
      .select("score").as[Double].head() == 99.0)
  }

  test("disjoint write sets commit concurrently") {
    val (sess, path) = freshStore()
    val tx1 = sess.beginTransaction(path)
    val tx2 = sess.beginTransaction(path)
    tx1.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 11.0")
    tx2.cypherUpdate("MATCH (n:Person {name: 'bob'}) SET n.score = 22.0")
    tx1.commitEpochChecked()
    val e2 = tx2.commitEpochChecked()
    val g = graft.sources.GraphIO.Epochs.asOf(spark, path, e2)
    assert(g.nodes.orderBy("id").select("score").as[Double].collect().toSeq
      == Seq(11.0, 22.0, 30.0))
  }

  test("edge writes conflict on the same (src,dst,rel)") {
    val (sess, path) = freshStore()
    val tx1 = sess.beginTransaction(path)
    val tx2 = sess.beginTransaction(path)
    tx1.cypherUpdate("MATCH ()-[r:KNOWS]->() SET r.weight = 2.0")
    tx2.cypherUpdate("MATCH ()-[r:KNOWS]->() DELETE r")
    tx1.commitEpochChecked()
    intercept[OptimisticTx.WriteConflictException](tx2.commitEpochChecked())
  }

  test("SSI: read-write conflict aborts only at Serializable") {
    val (sess, path) = freshStore()
    // tx1 writes ann; tx2 READS ann and writes cat
    val tx1 = sess.beginTransaction(path)
    val tx2 = sess.beginTransaction(path)
    tx1.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 11.0")
    tx2.recordRead(nodeIds = tx2.cypher(
      "MATCH (n:Person {name: 'ann'}) RETURN id(n) AS id"))
    tx2.cypherUpdate("MATCH (n:Person {name: 'cat'}) SET n.score = 33.0")
    tx1.commitEpochChecked()
    intercept[OptimisticTx.ReadConflictException](
      tx2.commitEpochChecked(OptimisticTx.Serializable))
    // the SAME situation passes at snapshot isolation (write sets disjoint)
    val (sessB, pathB) = freshStore()
    val t1 = sessB.beginTransaction(pathB)
    val t2 = sessB.beginTransaction(pathB)
    t1.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 11.0")
    t2.recordRead(nodeIds = t2.cypher(
      "MATCH (n:Person {name: 'ann'}) RETURN id(n) AS id"))
    t2.cypherUpdate("MATCH (n:Person {name: 'cat'}) SET n.score = 33.0")
    t1.commitEpochChecked()
    assert(t2.commitEpochChecked() >= 0)
  }

  test("a write set of only a schemaless property is detected, not lost") {
    // tx2's only change is SET of a prop OUTSIDE the typed schema — it
    // lands in the map-typed `props` fallback column. The diff must still
    // see the row change (map columns compare through a canonical JSON
    // encoding, not raw — and not only the base side's columns).
    val (sess, path) = freshStore()
    val tx1 = sess.beginTransaction(path)
    val tx2 = sess.beginTransaction(path)
    tx1.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 11.0")
    tx2.cypherUpdate("MATCH (n:Person {name: 'bob'}) SET n.nick = 'bobby'")
    tx1.commitEpochChecked()
    val e2 = tx2.commitEpochChecked() // head > base, disjoint → merge path
    val g = graft.sources.GraphIO.Epochs.asOf(spark, path, e2)
    assert(g.nodes.filter(col("name") === "bob")
      .select(element_at(col("props"), "nick")).as[String].head() == "bobby",
      "the schemaless write must survive the entity-granularity merge")
    assert(g.nodes.filter(col("name") === "ann")
      .select("score").as[Double].head() == 11.0)
    // and the SAME-node case is a conflict, not a silent pass
    val tx3 = sess.beginTransaction(path)
    val tx4 = sess.beginTransaction(path)
    tx3.cypherUpdate("MATCH (n:Person {name: 'cat'}) SET n.score = 31.0")
    tx4.cypherUpdate("MATCH (n:Person {name: 'cat'}) SET n.nick = 'kitty'")
    tx3.commitEpochChecked()
    intercept[OptimisticTx.WriteConflictException](tx4.commitEpochChecked())
  }

  test("contended merge-publish records a write-set sidecar; later validation reads it") {
    val (sess, path) = freshStore()
    // tx_a (uncontended) → e1, no sidecar; tx_b begun at e0 commits behind
    // it (contended, disjoint) → merge-publishes e2 WITH a sidecar
    val txA = sess.beginTransaction(path)
    val txB = sess.beginTransaction(path)
    txA.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 11.0")
    txB.cypherUpdate("MATCH (n:Person {name: 'bob'}) SET n.score = 22.0")
    val e1 = txA.commitEpochChecked()
    // tx_d begins between the two commits: its validation interval will be
    // exactly {e2}, which carries a sidecar — the O(changed keys) path
    val txD = sess.beginTransaction(path)
    val txDOk = sess.beginTransaction(path)
    val e2 = txB.commitEpochChecked()
    assert(new java.io.File(s"$path/e$e2/writeset").exists,
      "a contended merge-publish must record its write-set sidecar")
    // an uncontended commit whose transaction TRACKED its writes leaves a
    // sidecar too — the keys were free (no diff ran), and the next
    // validator then never pays a snapshot diff
    assert(new java.io.File(s"$path/e$e1/writeset").exists,
      "a tracked uncontended commit records its (free) write-set sidecar")
    assert(graft.sources.GraphIO.Epochs.epochWriteSet(spark, path, e1)
      .get._1.as[Long].collect().toSet == Set(1L))
    // the sidecar IS what validates: epochWriteSet(e2) must be defined and
    // contain exactly bob's id on the node side
    val ws = graft.sources.GraphIO.Epochs.epochWriteSet(spark, path, e2)
    assert(ws.isDefined)
    assert(ws.get._1.as[Long].collect().toSet == Set(2L))
    // conflicting write against e2's set aborts via the sidecar path...
    txD.cypherUpdate("MATCH (n:Person {name: 'bob'}) SET n.score = 99.0")
    intercept[OptimisticTx.WriteConflictException](txD.commitEpochChecked())
    // ... and a disjoint one passes and merges
    txDOk.cypherUpdate("MATCH (n:Person {name: 'cat'}) SET n.score = 33.0")
    val e3 = txDOk.commitEpochChecked()
    // all three disjoint writes survive the entity-granularity merges
    val g = graft.sources.GraphIO.Epochs.asOf(spark, path, e3)
    assert(g.nodes.orderBy("id").select("score").as[Double].collect().toSeq
      == Seq(11.0, 22.0, 33.0))
  }

  test("a partial (uncommitted) sidecar reads as None, never as an empty write set") {
    // a crashed recordWriteSet can leave the bare writeset dir with no
    // _SUCCESS; reading that back as an EMPTY key set would let a
    // genuinely conflicting transaction pass validation (lost update) —
    // the validator must fall back to the snapshot diff instead
    val (sess, path) = freshStore()
    val txA = sess.beginTransaction(path)
    val txB = sess.beginTransaction(path)
    txA.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 11.0")
    txB.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 99.0")
    val e1 = txA.commitEpochChecked()
    // simulate the crash artifact: bare writeset dir on the conflicting
    // epoch, no _SUCCESS (first dropping the sidecar the tracked commit
    // legitimately recorded — the artifact under test is a TORN write)
    val wsDir = new java.io.File(s"$path/e$e1/writeset")
    if (wsDir.exists) {
      wsDir.listFiles.foreach(_.delete())
      wsDir.delete()
    }
    wsDir.mkdirs()
    assert(graft.sources.GraphIO.Epochs.epochWriteSet(spark, path, e1).isEmpty,
      "an uncommitted sidecar must not be served")
    // ... and the conflict is still detected (via the fallback diff)
    intercept[OptimisticTx.WriteConflictException](txB.commitEpochChecked())
  }

  test("delta epochs serve their write set without a snapshot diff") {
    val (sess, path) = freshStore()
    // a single-writer delta commit lands between begin and commit: the
    // validator derives that epoch's keys from the delta rows themselves
    val tx = sess.beginTransaction(path)
    val txBad = sess.beginTransaction(path)
    val retagged = graft.graph.Mutations.setNodeProperty(sess.graph,
      col("name") === "ann", "score", lit(11.0))
    val e1 = graft.sources.GraphIO.Epochs.commitIncremental(retagged, path)
    val ws = graft.sources.GraphIO.Epochs.epochWriteSet(spark, path, e1)
    assert(ws.isDefined, "a delta epoch's change rows are its write set")
    assert(ws.get._1.as[Long].collect().toSet == Set(1L))
    tx.cypherUpdate("MATCH (n:Person {name: 'bob'}) SET n.score = 22.0")
    val e2 = tx.commitEpochChecked() // disjoint from {ann} → passes
    assert(graft.sources.GraphIO.Epochs.asOf(spark, path, e2)
      .nodes.orderBy("id").select("score").as[Double].collect().toSeq
      == Seq(11.0, 22.0, 30.0))
    txBad.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 99.0")
    intercept[OptimisticTx.WriteConflictException](txBad.commitEpochChecked())
  }

  test("OCC over a graph already carrying the props map column") {
    // map-typed columns are not legal raw join keys — validation and merge
    // must canonicalize them rather than throw AnalysisException
    val nodes = Seq((1L, Seq("Person"), "ann"), (2L, Seq("Person"), "bob"))
      .toDF("id", "labels", "name")
      .withColumn("props", map(lit("k"), lit("v")))
    val edges = Seq((1L, 2L, "KNOWS")).toDF("src", "dst", "rel")
    val g = PropertyGraph(nodes, edges)
    val path = java.nio.file.Files.createTempDirectory("graft_otx_map").toString
    graft.sources.GraphIO.Epochs.commit(g, path)
    val sess = new GraftSession(spark, g)
    val tx1 = sess.beginTransaction(path)
    val tx2 = sess.beginTransaction(path)
    tx1.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.k = 'x'")
    tx2.cypherUpdate("MATCH (n:Person {name: 'bob'}) SET n.k = 'y'")
    tx1.commitEpochChecked()
    val e2 = tx2.commitEpochChecked()
    val gg = graft.sources.GraphIO.Epochs.asOf(spark, path, e2)
    val byName = gg.nodes.select(col("name"),
      element_at(col("props"), "k").as("k")).as[(String, String)].collect().toMap
    assert(byName == Map("ann" -> "x", "bob" -> "y"))
  }

  test("no later epochs → commit publishes without validation cost") {
    val (sess, path) = freshStore()
    val tx = sess.beginTransaction(path)
    tx.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 11.0")
    val e = tx.commitEpochChecked(OptimisticTx.Serializable)
    assert(graft.sources.GraphIO.Epochs.list(spark, path) == Seq(0L, e))
  }

  test("a key-column rewrite declines tracking and merges both sides") {
    // SET n.id changes the entity's IDENTITY: the tracked write set only
    // knows the pre-mutation key, so tracking must decline (no sidecar —
    // the diff fallback sees {old, new}) and a contended merge must
    // publish the RENAMED row, not silently drop it
    val (sess, path) = freshStore()
    // uncontended: an id rewrite must DECLINE tracking — a tracked commit
    // would leave a free sidecar, so its absence is the observable
    val tx0 = sess.beginTransaction(path)
    tx0.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.id = 7")
    val e1 = tx0.commitEpochChecked()
    assert(!new java.io.File(s"$path/e$e1/writeset").exists,
      "a key rewrite must not record a (pre-key-only) tracked sidecar")
    // contended: the diff fallback sees BOTH sides of the rename, so the
    // merge publishes the renamed row and the sidecar carries {old, new}
    val tx1 = sess.beginTransaction(path)
    val tx2 = sess.beginTransaction(path)
    tx1.cypherUpdate("MATCH (n:Person {name: 'bob'}) SET n.score = 22.0")
    tx2.cypherUpdate("MATCH (n:Person {name: 'cat'}) SET n.id = 99")
    tx1.commitEpochChecked()
    val e3 = tx2.commitEpochChecked() // disjoint entities → merge path
    val ws = graft.sources.GraphIO.Epochs.epochWriteSet(spark, path, e3)
    assert(ws.isDefined && ws.get._1.as[Long].collect().toSet == Set(3L, 99L),
      "the merge sidecar must carry both the old and the renamed key")
    val g = graft.sources.GraphIO.Epochs.asOf(spark, path, e3)
    assert(g.nodes.orderBy("id").select("id").as[Long].collect().toSeq
      == Seq(2L, 7L, 99L), "the renamed row must survive the merge")
    assert(g.nodes.filter(col("id") === 2L)
      .select("score").as[Double].head() == 22.0,
      "the merge must keep the other transaction's write underneath")
  }

  test("null-bound OPTIONAL MATCH targets don't poison the write set") {
    // an OPTIONAL MATCH can bind the update target to null; the mutation
    // writes nothing for those rows, so the null must not enter the
    // tracked keys — two such transactions on DISJOINT real entities
    // would otherwise null-match each other and spuriously conflict
    val (sess, path) = freshStore()
    val tx1 = sess.beginTransaction(path)
    val tx2 = sess.beginTransaction(path)
    tx1.cypherUpdate("MATCH (n:Person {name: 'ann'}) " +
      "OPTIONAL MATCH (n)-[:NOPE]->(m) SET n.score = 11.0, m.score = 1.0")
    tx2.cypherUpdate("MATCH (n:Person {name: 'cat'}) " +
      "OPTIONAL MATCH (n)-[:NOPE]->(m) SET n.score = 33.0, m.score = 1.0")
    val e1 = tx1.commitEpochChecked()
    val ws = graft.sources.GraphIO.Epochs.epochWriteSet(spark, path, e1)
    assert(ws.isDefined && ws.get._1.as[Long].collect().toSet == Set(1L),
      "the tracked node keys must be exactly ann's id — no null row")
    val e2 = tx2.commitEpochChecked() // disjoint → must NOT conflict
    assert(graft.sources.GraphIO.Epochs.asOf(spark, path, e2)
      .nodes.orderBy("id").select("score").as[Double].collect().toSeq
      == Seq(11.0, 20.0, 33.0))
  }

  test("null-bound OPTIONAL CREATE endpoints don't poison the edge write set") {
    // mirror of the node test for CREATE: OPTIONAL MATCH binds an endpoint
    // to null, CREATE writes no edge for those rows — a null (src,dst)
    // tracked key would null-safe-match the OTHER transaction's null row
    // on the same rel type and spuriously abort two disjoint commits
    val (sess, path) = freshStore()
    val tx1 = sess.beginTransaction(path)
    val tx2 = sess.beginTransaction(path)
    tx1.cypherUpdate("MATCH (n:Person {name: 'ann'}) " +
      "OPTIONAL MATCH (n)-[:NOPE]->(m) CREATE (n)-[:LIKES]->(m)")
    tx2.cypherUpdate("MATCH (n:Person {name: 'cat'}) " +
      "OPTIONAL MATCH (n)-[:NOPE]->(m) CREATE (n)-[:LIKES]->(m)")
    val e1 = tx1.commitEpochChecked()
    val ws = graft.sources.GraphIO.Epochs.epochWriteSet(spark, path, e1)
    ws.foreach { case (_, edgeKeys) =>
      assert(edgeKeys.filter(col("src").isNull || col("dst").isNull).isEmpty,
        "no null endpoint row may enter the tracked edge keys")
    }
    tx2.commitEpochChecked() // disjoint → must NOT conflict
  }

  test("compact prunes the base: contended commit aborts retryably, retry succeeds") {
    // commit chain → compact → the pre-compact transaction's base (and
    // every sidecar before the folded head) is gone. The interval
    // (base, head] is no longer enumerable, so the commit must abort with
    // the SAME retryable exception a write-write conflict raises — the
    // WAL-checkpoint-truncation semantics — never pass unvalidated and
    // never die inside asOf(prunedBase).
    val (sess, path) = freshStore()
    val txOld = sess.beginTransaction(path) // base = e0
    txOld.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 11.0")
    // an intervening committed chain, then compact folds it away
    val tx2 = sess.beginTransaction(path)
    tx2.cypherUpdate("MATCH (n:Person {name: 'bob'}) SET n.score = 22.0")
    tx2.commitEpochChecked()
    val rc = graft.tools.Cli.run(spark, Seq("compact", path), json = false,
      limit = 20, flag = _ => false, flagVal = _ => None)
    assert(rc == 0)
    val folded = graft.sources.GraphIO.Epochs.list(spark, path)
    assert(folded.size == 1, "compact must leave exactly the folded head")
    val e = intercept[OptimisticTx.WriteConflictException](txOld.commitEpochChecked())
    assert(e.getMessage.contains("pruned"),
      s"the abort must name the pruned base, got: ${e.getMessage}")
    // rebase on the post-compact head: the same update now commits and
    // lands on top of the folded state (tx2's write underneath)
    val txRetry = sess.beginTransaction(path)
    txRetry.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 11.0")
    val eNew = txRetry.commitEpochChecked()
    val g = graft.sources.GraphIO.Epochs.asOf(spark, path, eNew)
    assert(g.nodes.orderBy("id").select("score").as[Double].collect().toSeq
      == Seq(11.0, 22.0, 30.0))
  }

  test("post-compact chain validates via the snapshot-diff fallback") {
    // after compact, the folded head records no write set; a transaction
    // based on it that races a sidecar-less full commit must fall back to
    // the snapshot diff (both asOf endpoints exist) and still detect the
    // genuine conflict
    val (sess, path) = freshStore()
    val rc = graft.tools.Cli.run(spark, Seq("compact", path), json = false,
      limit = 20, flag = _ => false, flagVal = _ => None)
    assert(rc == 0)
    val tx1 = sess.beginTransaction(path) // base = folded head
    tx1.cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 11.0")
    // a plain full commit with NO sidecar lands after tx1's base
    val mutated = new GraftSession(spark,
      graft.sources.GraphIO.Epochs.latest(spark, path))
      .cypherUpdate("MATCH (n:Person {name: 'ann'}) SET n.score = 50.0")
    graft.sources.GraphIO.Epochs.commit(mutated, path)
    val e = intercept[OptimisticTx.WriteConflictException](tx1.commitEpochChecked())
    assert(e.getMessage.contains("write-write"))
  }
}
