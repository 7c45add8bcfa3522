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

  private def cli(args: String*): Unit = {
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
}
