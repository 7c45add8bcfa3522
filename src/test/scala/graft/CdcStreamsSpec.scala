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
}
