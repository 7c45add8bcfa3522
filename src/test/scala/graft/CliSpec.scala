package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.Cli

/** The CLI surface (reference grafeo-cli command set): import → query →
  * backup → restore round-trips hash-equal, and the maintenance commands
  * (checkpoint, compact) preserve the head state exactly.
  */
class CliSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def cli(args: String*): Int = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    Cli.run(spark, pos.toSeq, json = false, limit = 20,
      flag = n => flags.contains(s"--$n"),
      flagVal = n => flags.collectFirst {
        case f if f.startsWith(s"--$n=") => f.stripPrefix(s"--$n=") })
  }

  private def graphHash(store: String): (Set[String], Set[String]) = {
    val g = Cli.openStore(spark, store)
    (g.nodes.toJSON.collect().toSet, g.edges.toJSON.collect().toSet)
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("import -> query -> backup -> restore round-trips hash-equal") {
    // CSV input in the CLI's interchange layout
    val in = tmp("graft_cli_in")
    Seq((1L, "Person", "ann"), (2L, "Person", "bob"), (3L, "City", "rome"))
      .toDF("id", "labels", "name")
      .write.option("header", "true").mode("overwrite").csv(s"$in/nodes")
    Seq((1L, 2L, "KNOWS"), (1L, 3L, "LIVES_IN"))
      .toDF("src", "dst", "rel")
      .write.option("header", "true").mode("overwrite").csv(s"$in/edges")

    val store = tmp("graft_cli_store")
    cli("data", "load", in, store, "--format=csv")
    assert(graft.sources.GraphIO.Epochs.list(spark, store) == Seq(0L))

    // query the stored graph through the session surface the CLI uses
    val sess = new GraftSession(spark, Cli.openStore(spark, store))
    assert(sess.cypher("MATCH (p:Person) RETURN count(*) AS n")
      .as[Long].head() == 2L)

    val backup = tmp("graft_cli_backup")
    cli("backup", "create", store, backup)
    val restored = tmp("graft_cli_restored")
    cli("backup", "restore", backup, restored, "--force")

    assert(graphHash(store) == graphHash(restored),
      "restore must reproduce the exact node/edge sets")
  }

  test("wal checkpoint and compact preserve the head state") {
    val store = tmp("graft_cli_store2")
    val g = graft.graph.PropertyGraph(
      Seq((1L, Seq("N"), 1.0), (2L, Seq("N"), 2.0)).toDF("id", "labels", "v"),
      Seq((1L, 2L, "L")).toDF("src", "dst", "rel"))
    graft.sources.GraphIO.Epochs.commit(g, store)
    // a couple of delta epochs on top
    val g1 = graft.graph.Mutations.setNodeProperty(g, col("id") === 1L, "v", lit(10.0))
    graft.sources.GraphIO.Epochs.commitIncremental(g1, store)
    val g2 = graft.graph.Mutations.setNodeProperty(g1, col("id") === 2L, "v", lit(20.0))
    graft.sources.GraphIO.Epochs.commitIncremental(g2, store)
    val before = graphHash(store)

    cli("wal", "checkpoint", store) // head re-committed as a full snapshot
    assert(graphHash(store) == before)
    val es = graft.sources.GraphIO.Epochs.list(spark, store)
    assert(es.size == 4)

    cli("compact", store, "--dry-run")
    assert(graft.sources.GraphIO.Epochs.list(spark, store).size == 4,
      "dry-run must not change the store")
    cli("compact", store)
    // crash-safe order: the folded head commits FIRST (epoch 4), then the
    // older epochs are pruned — one readable epoch remains, numbering
    // preserved
    assert(graft.sources.GraphIO.Epochs.list(spark, store) == Seq(4L),
      "compact prunes down to the single folded epoch")
    assert(graphHash(store) == before,
      "compaction must preserve the head state exactly")
    // pruned epochs' claim markers go with them: only the kept epoch's
    // claim survives, so `wal status` never reports pruned history as
    // 'claimed-unpublished' (a crashed-commit signature)
    val claims = new java.io.File(s"$store/_claims").list().toSeq
      .filter(_.forall(_.isDigit))
    assert(claims == Seq("4"),
      s"compact must prune stale claim markers, got $claims")

    // next commit after compact stays monotonic via the surviving claim
    graft.sources.GraphIO.Epochs.commitIncremental(g2, store)
    assert(graft.sources.GraphIO.Epochs.list(spark, store) == Seq(4L, 5L))
  }

  test("compact refuses when an unpublished claim suggests a live writer") {
    val store = tmp("graft_cli_store4")
    val g = graft.graph.PropertyGraph(
      Seq((1L, Seq("N"), 1.0)).toDF("id", "labels", "v"),
      Seq((1L, 1L, "L")).toDF("src", "dst", "rel"))
    graft.sources.GraphIO.Epochs.commit(g, store)
    // simulate a writer mid-commit: a claim newer than the head with no
    // published epoch behind it
    val claim = new java.io.File(s"$store/_claims/7")
    claim.getParentFile.mkdirs()
    claim.createNewFile()
    assert(cli("compact", store) == 1,
      "compact must refuse while an in-flight claim exists")
    assert(graft.sources.GraphIO.Epochs.list(spark, store) == Seq(0L),
      "a refused compact must not touch the store")
    assert(cli("compact", store, "--force") == 0,
      "--force acknowledges the exclusivity contract")
    // the stale claim 7 advances the allocator, so the folded head lands
    // ABOVE it — numbering stays monotonic even past abandoned claims
    val after = graft.sources.GraphIO.Epochs.list(spark, store)
    assert(after.size == 1 && after.head > 7L,
      s"forced compact must fold to a single epoch above the stale claim, got $after")
  }

  test("info/stats/schema/validate render without error on both store kinds") {
    val store = tmp("graft_cli_store3")
    val g = graft.graph.PropertyGraph(
      Seq((1L, Seq("N"), "x")).toDF("id", "labels", "name"),
      Seq((1L, 1L, "SELF")).toDF("src", "dst", "rel"))
    graft.sources.GraphIO.Epochs.commit(g, store)
    cli("info", store)
    cli("stats", store)
    cli("schema", store)
    cli("validate", store)
    // plain snapshot (non-epoch) store
    val snap = tmp("graft_cli_snap")
    graft.sources.GraphIO.save(g, snap)
    cli("info", snap)
    cli("query", snap, "MATCH (n:N) RETURN n.name AS name")
  }

  test("validate exit status distinguishes healthy from corrupt stores") {
    val store = tmp("graft_cli_ok")
    val g = graft.graph.PropertyGraph(
      Seq((1L, Seq("N"), "x"), (2L, Seq("N"), "y")).toDF("id", "labels", "name"),
      Seq((1L, 2L, "L")).toDF("src", "dst", "rel"))
    graft.sources.GraphIO.Epochs.commit(g, store)
    assert(cli("validate", store) == 0)

    // an edge referencing a node that does not exist is an error kind
    val bad = tmp("graft_cli_bad")
    graft.sources.GraphIO.Epochs.commit(graft.graph.PropertyGraph(
      g.nodes, Seq((1L, 99L, "L")).toDF("src", "dst", "rel")), bad)
    assert(cli("validate", bad) == 1,
      "dangling edge references must surface as a nonzero exit status")
  }

  test("index create persists a servable index; list/stats report it") {
    val store = tmp("graft_cli_idx")
    val vecs: Seq[Array[Float]] = Seq(
      Array(1f, 0f, 0f, 0f), Array(0.9f, 0.1f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0.9f, 0.1f, 0f), Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val nodes = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, Seq("Doc"), v) }
      .toDF("id", "labels", "emb")
    val g = graft.graph.PropertyGraph(nodes,
      Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel"))
    graft.sources.GraphIO.Epochs.commit(g, store)

    assert(cli("index", "create", store, "ix", "Doc", "emb",
      "--method=hnsw", "--options=m=8,efconstruction=32") == 0)
    assert(cli("index", "list", store) == 0)
    assert(cli("index", "stats", store) == 0)

    // a NEW session (fresh process analog) serves the persisted index with
    // results identical to a brute-force top-k over the same corpus
    val loaded = graft.frontends.gql.VectorIndexes.load(
      spark, s"$store/_indexes/ix",
      Cli.openStore(spark, store).nodesWithLabel("Doc").select($"id", $"emb"))
    val sess = new GraftSession(spark, Cli.openStore(spark, store))
    sess.registerVectorIndex(loaded)
    val queries = Seq((100L, Array(1f, 0f, 0f, 0f))).toDF("qid", "qv")
    val got = sess.vectorSearch("ix", queries, "qid", "qv", 2)
      .orderBy("rank").select("nid").as[Long].collect().toSeq
    assert(got == Seq(0L, 1L),
      s"persisted HNSW must return the true top-2 neighbors, got $got")

    // --auto-tune only runs for LSH; for any other method it must fail
    // loudly instead of silently skipping both the tuner AND the recall
    // self-check (r17 ADVICE). main() maps UsageError to exit 1.
    val e = intercept[graft.tools.UsageError] {
      cli("index", "create", store, "ix2", "Doc", "emb",
        "--method=hnsw", "--auto-tune")
    }
    assert(e.getMessage.contains("auto-tune"))
  }
}
