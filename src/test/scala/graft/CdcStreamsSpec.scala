package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.PropertyGraph
import graft.pipeline.Dedup
import graft.streaming.CdcStreams

/** Epochs CDC → Structured Streaming integration: the change feed written
  * by commitWithFeed drives the MinHash-LSH near-dup pipeline
  * INCREMENTALLY (sign only the delta, band-join against the signature
  * store), and after each run the accumulated pairs equal the batch
  * recompute over the epoch head — the incremental ≡ batch property that
  * makes the CDC path trustworthy for a 100 TB corpus where re-signing
  * everything per commit is not an option.
  */
class CdcStreamsSpec extends AnyFunSuite {
  import TestSpark._

  private def docGraph(docs: Seq[(Long, String)]): PropertyGraph = {
    import spark.implicits._
    val nodes = docs.toDF("id", "text")
      .select(col("id"), array(lit("Document")).as("labels"), col("text"))
    PropertyGraph(nodes, Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel"))
  }

  private def batchPairs(docs: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    Dedup.minHashNearDuplicates(docs.toDF("id", "text"), "id", "text",
      n = 2, numHashes = 16, bands = 16, threshold = 0.5)
  }

  private def assertSame(incremental: DataFrame, batch: DataFrame): Unit = {
    val a = incremental.select("id1", "id2", "jac")
    val b = batch.select("id1", "id2", "jac")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"incremental=${a.orderBy("id1", "id2").collect().mkString(",")} " +
        s"batch=${b.orderBy("id1", "id2").collect().mkString(",")}")
  }

  private val baseDocs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank",
    2L -> "the quick brown fox jumps over the lazy dog near the river",
    3L -> "completely different text about spark structured streaming state",
    4L -> "graph engines compile declarative patterns into relational plans")

  test("incremental near-dup over two commits equals batch recompute") {
    val store = java.nio.file.Files.createTempDirectory("graft_cdc_store").toString
    val work = java.nio.file.Files.createTempDirectory("graft_cdc_work").toString

    // epoch 0: base corpus (one planted near-dup pair 1-2)
    CdcStreams.commitWithFeed(docGraph(baseDocs), store)
    CdcStreams.incrementalNearDupRun(spark, store, work)
    assertSame(CdcStreams.nearDupPairs(spark, work), batchPairs(baseDocs))

    // epoch 1: two new docs, one a near-dup of doc 3 (a cross-commit pair:
    // provable only if the new signatures join the PERSISTED store)
    val more = baseDocs ++ Seq(
      5L -> "completely different text about spark structured streaming",
      6L -> "unrelated content mentioning neither foxes nor query engines")
    CdcStreams.commitWithFeed(docGraph(more), store)
    CdcStreams.incrementalNearDupRun(spark, store, work)
    assertSame(CdcStreams.nearDupPairs(spark, work), batchPairs(more))

    // incrementality: each document was signed exactly once across both
    // runs (the second run consumed only the epoch-1 delta)
    val sigs = spark.read.parquet(s"$work/sigs")
    assert(sigs.count() == more.size, "delta run must not re-sign the corpus")
    assert(sigs.groupBy("__id").count().filter(col("count") > 1).isEmpty)
  }

  test("a crashed mid-promote is completed by the next commit — consumers see the whole feed") {
    val store = java.nio.file.Files.createTempDirectory("graft_cdc_store3").toString
    val work = java.nio.file.Files.createTempDirectory("graft_cdc_work3").toString
    CdcStreams.commitWithFeed(docGraph(baseDocs), store)
    CdcStreams.incrementalNearDupRun(spark, store, work)

    // epoch 1 as a FULL commit (fullEvery=1) so the staged-promote path
    // runs, then SIMULATE a crash that happened mid-promote: move the
    // epoch's promoted node-feed files back into a marked stage dir —
    // exactly the on-disk state a crash between the two promote calls
    // leaves behind (edges published, nodes not, `_staged` marker present)
    val more = baseDocs ++ Seq(
      5L -> "completely different text about spark structured streaming",
      6L -> "unrelated content mentioning neither foxes nor query engines")
    val e1 = CdcStreams.commitWithFeed(docGraph(more), store, fullEvery = 1)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outNodes = new org.apache.hadoop.fs.Path(s"$store/_cdc/nodes")
    val stage = new org.apache.hadoop.fs.Path(s"$store/_cdc_stage/crashtest")
    fs.mkdirs(new org.apache.hadoop.fs.Path(stage, "nodes"))
    val moved = fs.listStatus(outNodes).filter(_.getPath.getName.startsWith(s"f${e1}_"))
    assert(moved.nonEmpty, "epoch-1 full commit must have promoted node feed files")
    moved.foreach { st =>
      // undo the promote: strip the f<epoch>_ prefix back to the staged name
      val orig = st.getPath.getName.stripPrefix(s"f${e1}_")
      assert(fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(s"$stage/nodes/$orig")))
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(stage, "_staged"), true)
    out.write(e1.toString.getBytes("UTF-8")); out.close()

    // the next consumer-side recovery (runs automatically on every commit;
    // here invoked directly) must finish the promote, after which the
    // incremental pipeline sees the complete epoch-1 feed
    CdcStreams.recoverOutbox(spark, store)
    assert(!fs.exists(stage), "recovered stage dir must be removed")
    assert(fs.listStatus(outNodes).exists(_.getPath.getName.startsWith(s"f${e1}_")))
    CdcStreams.incrementalNearDupRun(spark, store, work)
    assertSame(CdcStreams.nearDupPairs(spark, work), batchPairs(more))
  }

  test("a corrupt (0-byte) _staged marker does not wedge later commits") {
    // crash between marker create and write leaves a 0-byte _staged file;
    // recovery must skip it (that feed attempt is lost-whole — the
    // documented crash-window outcome), NOT throw on every later commit
    val store = java.nio.file.Files.createTempDirectory("graft_cdc_store4").toString
    CdcStreams.commitWithFeed(docGraph(baseDocs), store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(s"$store/_cdc_stage/corrupt")
    fs.mkdirs(stage)
    fs.create(new org.apache.hadoop.fs.Path(stage, "_staged"), true).close()
    CdcStreams.recoverOutbox(spark, store) // must not throw
    // and the next commit (which runs recovery first) still succeeds
    val more = baseDocs :+ (9L -> "one more unrelated document body here")
    val e = CdcStreams.commitWithFeed(docGraph(more), store,
      prevGraph = Some(docGraph(baseDocs)))
    assert(e == 1L)
  }

  test("abandoned-stage aging keys off the newest FILE mtime, not the dir mtime") {
    // object stores report 0/create-time for directory mtimes — a live
    // commit's stage whose DIR looks ancient but whose files are fresh
    // must survive recovery; only a stage whose newest file is past the
    // abandon window may be deleted
    val store = java.nio.file.Files.createTempDirectory("graft_cdc_store5").toString
    CdcStreams.commitWithFeed(docGraph(baseDocs), store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mkStage(name: String, dirAge: Long, fileAge: Long): org.apache.hadoop.fs.Path = {
      val stage = new org.apache.hadoop.fs.Path(s"$store/_cdc_stage/$name")
      fs.mkdirs(new org.apache.hadoop.fs.Path(stage, "nodes"))
      val f = new org.apache.hadoop.fs.Path(stage, "nodes/part-00000")
      val out = fs.create(f, true); out.write(1); out.close()
      val now = System.currentTimeMillis()
      fs.setTimes(f, now - fileAge, -1)
      fs.setTimes(stage, now - dirAge, -1)
      stage
    }
    // unmarked stage: dir "ancient", file fresh -> a live writer, keep it
    val live = mkStage("live", dirAge = 10L * 60 * 60 * 1000, fileAge = 0L)
    // unmarked stage: every file old -> abandoned, age it out
    val dead = mkStage("dead", dirAge = 0L,
      fileAge = 10L * 60 * 60 * 1000)
    // a fresh dir mtime alone must NOT keep a stage whose files are stale
    fs.setTimes(dead, System.currentTimeMillis(), -1)
    System.setProperty("graft.cdc.stageAbandonMs", (60L * 60 * 1000).toString)
    try CdcStreams.recoverOutbox(spark, store)
    finally System.clearProperty("graft.cdc.stageAbandonMs")
    assert(fs.exists(live),
      "a stage with fresh files must survive recovery regardless of dir mtime")
    assert(!fs.exists(dead),
      "a stage whose newest file is past the window must be aged out")
  }

  test("fuse gates: id-broadcast and byte caps force the unfused shapes, same pairs") {
    // (a) broadcastMaxDocs below the batch size must forbid the fused
    //     broadcast even though fuseMaxDocs alone would allow it;
    // (b) a tiny fuseMaxBroadcastBytes must push large-document batches
    //     off the grams-carrying broadcast. Both fall back to shuffled /
    //     pair-fetch shapes — results must be identical either way.
    for ((k, v) <- Seq("spark.graft.cdc.broadcastMaxDocs" -> "1",
                       "spark.graft.cdc.fuseMaxBroadcastBytes" -> "1")) {
      val store = java.nio.file.Files.createTempDirectory("graft_cdc_store_g").toString
      val work = java.nio.file.Files.createTempDirectory("graft_cdc_work_g").toString
      spark.conf.set(k, v)
      try {
        CdcStreams.commitWithFeed(docGraph(baseDocs), store)
        CdcStreams.incrementalNearDupRun(spark, store, work)
        assertSame(CdcStreams.nearDupPairs(spark, work), batchPairs(baseDocs))
      } finally spark.conf.unset(k)
    }
  }

  test("document update and removal retire stale pairs") {
    val store = java.nio.file.Files.createTempDirectory("graft_cdc_store2").toString
    val work = java.nio.file.Files.createTempDirectory("graft_cdc_work2").toString

    CdcStreams.commitWithFeed(docGraph(baseDocs), store)
    CdcStreams.incrementalNearDupRun(spark, store, work)

    // epoch 1: doc 2 rewritten away from doc 1 (update = remove+add of the
    // same id), doc 4 removed outright
    val changed = Seq(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank",
      2L -> "totally rewritten second document no longer resembling the first",
      3L -> "completely different text about spark structured streaming state")
    CdcStreams.commitWithFeed(docGraph(changed), store)
    CdcStreams.incrementalNearDupRun(spark, store, work)
    assertSame(CdcStreams.nearDupPairs(spark, work), batchPairs(changed))
    assert(CdcStreams.nearDupPairs(spark, work).isEmpty,
      "rewritten doc 2 must retire the 1-2 near-dup pair")
  }

  test("several epochs drained in ONE micro-batch still equal the batch recompute") {
    // Trigger.AvailableNow coalesces every unconsumed commit into one
    // micro-batch: an id UPDATED across those commits has two add rows and
    // a tombstone in the same batch (batch-id versioning signed an
    // arbitrary text — the r16 review find), and an id added then removed
    // must neither sign nor pair. Rows are versioned by the epoch in their
    // outbox file name, so only each id's FINAL text survives.
    val store = java.nio.file.Files.createTempDirectory("graft_cdc_store6").toString
    val work = java.nio.file.Files.createTempDirectory("graft_cdc_work6").toString
    // epoch 0: base; epoch 1: doc 2 rewritten TO a near-dup of doc 3 and a
    // transient doc 7 added; epoch 2: doc 7 removed and doc 2 rewritten
    // AGAIN back to a near-dup of doc 1 — the arbitrary-pick bug pairs 2-3
    // (stale middle text) about half the runs; the final state pairs 1-2
    val v1 = baseDocs.map {
      case (2L, _) => 2L -> "completely different text about spark structured streaming node"
      case d => d
    } :+ (7L -> "a transient document that exists for exactly one epoch only")
    val v2 = baseDocs // back to the original near-dup structure, doc 7 gone
    CdcStreams.commitWithFeed(docGraph(baseDocs), store)
    CdcStreams.commitWithFeed(docGraph(v1), store,
      prevGraph = Some(docGraph(baseDocs)))
    CdcStreams.commitWithFeed(docGraph(v2), store, prevGraph = Some(docGraph(v1)))
    // ONE consumer run drains all three epochs
    CdcStreams.incrementalNearDupRun(spark, store, work)
    assertSame(CdcStreams.nearDupPairs(spark, work), batchPairs(v2))
    // the transient doc's signature must not survive in the live store
    val liveSigs = spark.read.parquet(s"$work/sigs")
    assert(!CdcStreams.nearDupPairs(spark, work).collect()
      .exists(r => r.getLong(0) == 7L || r.getLong(1) == 7L))
  }

  test("small-delta drains plan their dedups exchange-free (r18)") {
    // The multi-epoch small-delta drain narrows to one partition BEFORE
    // the ordering groupBys / pair dedup, so SinglePartition satisfies the
    // aggregates' distribution and NO shuffle exchange plans. First pin
    // the Spark behavior the optimization relies on...
    val agg = spark.range(100)
      .select((col("id") % 10).as("k"), col("id").as("v"))
      .coalesce(1).groupBy("k").agg(max("v"))
    agg.collect()
    val hasExchange = agg.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.exists {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
          case _ => false
        }
      case _ => false
    }
    assert(!hasExchange,
      "coalesce(1) -> groupBy must plan no exchange; the CDC small-delta " +
        "drain's exchange-free dedups depend on it")

    // ...then pin the whole drain's job budget: a 2-epoch small-delta
    // catch-up (the q_cdc_neardup shape) is load-invariant in job count,
    // so a regrown shuffle/action on this path fails here even when
    // wall-clock noise would hide it.
    val store = java.nio.file.Files.createTempDirectory("graft_cdc_store7").toString
    val work = java.nio.file.Files.createTempDirectory("graft_cdc_work7").toString
    CdcStreams.commitWithFeed(docGraph(baseDocs), store)
    val v1 = baseDocs :+ (9L -> "the quick brown fox jumps over the lazy dog near the river side")
    CdcStreams.commitWithFeed(docGraph(v1), store,
      prevGraph = Some(docGraph(baseDocs)))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      CdcStreams.incrementalNearDupRun(spark, store, work)
      Thread.sleep(100)
      assert(jobs.get <= 12,
        s"2-epoch small-delta drain ran ${jobs.get} jobs (budget 12)")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and the answer is still right
    assertSame(CdcStreams.nearDupPairs(spark, work), batchPairs(v1))
  }

  test("pre-epoch-versioned state dirs are refused loudly, not silently mixed") {
    val store = java.nio.file.Files.createTempDirectory("graft_cdc_store5").toString
    val work = java.nio.file.Files.createTempDirectory("graft_cdc_work5").toString
    CdcStreams.commitWithFeed(docGraph(baseDocs), store)

    // a fresh run writes the _format marker; subsequent reads accept it
    CdcStreams.incrementalNearDupRun(spark, store, work)
    val fmt = new java.io.File(s"$work/_format")
    assert(fmt.exists(), "first run must write the _format version marker")
    assert(CdcStreams.nearDupPairs(spark, work).count() >= 0)

    // a state dir CARRYING rows but LACKING the marker is the pre-r16
    // batch-id-versioned format: its __b units would misorder the
    // strictly-later tombstone prune against epochs — refuse, both faces
    // (drop the LocalFileSystem's sidecar checksum with the file, so the
    // later direct rewrite below doesn't trip a stale-crc read instead)
    assert(fmt.delete())
    new java.io.File(s"$work/._format.crc").delete()
    val eRun = intercept[IllegalStateException] {
      CdcStreams.incrementalNearDupRun(spark, store, work)
    }
    assert(eRun.getMessage.contains("_format"))
    val eRead = intercept[IllegalStateException] {
      CdcStreams.nearDupPairs(spark, work)
    }
    assert(eRead.getMessage.contains("_format"))

    // an explicit FUTURE/UNKNOWN version is refused too (forward-compat:
    // state written by a newer format must not be reinterpreted)
    val w = new java.io.PrintWriter(fmt); w.print("99"); w.close()
    val eVer = intercept[IllegalStateException] {
      CdcStreams.nearDupPairs(spark, work)
    }
    assert(eVer.getMessage.contains("99"))

    // an EMPTY dir with no marker is just a fresh start — never refused
    val fresh = java.nio.file.Files.createTempDirectory("graft_cdc_fresh5").toString
    assert(CdcStreams.nearDupPairs(spark, fresh).isEmpty)
  }
}
