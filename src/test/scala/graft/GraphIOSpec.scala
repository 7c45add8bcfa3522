package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{PropertyGraph, QuadStore, TpchGraph, TpchRdf}
import graft.sources.GraphIO

class GraphIOSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graphio").toString

  test("property-graph snapshot round-trips exactly") {
    val g = TpchGraph(spark, sf)
    val dir = tmp()
    GraphIO.save(g, dir)
    val back = GraphIO.load(spark, dir)
    assert(back.nodes.count() == g.nodes.count())
    assert(back.edges.count() == g.edges.count())
    // content-equality both ways (null-safe join on all columns)
    val cols = g.edges.columns.toSeq
    val missing = g.edges.join(back.edges, cols, "left_anti").count()
    val extra = back.edges.join(g.edges, cols, "left_anti").count()
    assert(missing == 0 && extra == 0)
  }

  test("epoch store: commit e0, mutate to e1, as-of reads see both") {
    val dir = tmp()
    def mk(ids: Seq[Long]): PropertyGraph = PropertyGraph(
      ids.toDF("id").withColumn("labels", array(lit("N")))
        .withColumn("name", col("id").cast("string")),
      Seq.empty[(Long, Long)].toDF("src", "dst")
        .withColumn("rel", lit("E")).withColumn("weight", lit(1.0)))
    val e0 = GraphIO.Epochs.commit(mk(Seq(1L, 2L)), dir)
    val e1 = GraphIO.Epochs.commit(mk(Seq(1L, 2L, 3L)), dir)
    assert(e0 == 0L && e1 == 1L)
    assert(GraphIO.Epochs.list(spark, dir) == Seq(0L, 1L))
    // snapshot isolation: e0 is unchanged by e1's commit
    assert(GraphIO.Epochs.asOf(spark, dir, 0L).nodes.count() == 2)
    assert(GraphIO.Epochs.asOf(spark, dir, 1L).nodes.count() == 3)
    assert(GraphIO.Epochs.latest(spark, dir).nodes.count() == 3)
    // uncommitted epochs are unreadable
    assertThrows[IllegalArgumentException](GraphIO.Epochs.asOf(spark, dir, 7L))
    // a session-level round trip: commitEpoch + asOf
    val s2 = new GraftSession(spark, mk(Seq(9L)))
    val e2 = s2.commitEpoch(dir)
    assert(e2 == 2L)
    assert(s2.asOf(dir, e2).graph.nodes.count() == 1)
  }

  test("epoch store: concurrent commits race on the marker, both land") {
    val dir = tmp()
    def mk(id: Long): PropertyGraph = PropertyGraph(
      Seq(id).toDF("id").withColumn("labels", array(lit("N"))),
      Seq.empty[(Long, Long)].toDF("src", "dst").withColumn("rel", lit("E")))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1L to 4L).map(i => Future(GraphIO.Epochs.commit(mk(i), dir)))
    val epochs = Await.result(Future.sequence(fs), 120.seconds)
    // optimistic concurrency: every writer lands on a DISTINCT epoch
    assert(epochs.toSet.size == 4)
    assert(GraphIO.Epochs.list(spark, dir).toSet == epochs.toSet)
    // each committed epoch reads back a consistent one-node snapshot
    epochs.foreach(e =>
      assert(GraphIO.Epochs.asOf(spark, dir, e).nodes.count() == 1))
  }

  test("rdf snapshot round-trips with canonical column order") {
    val g = TpchRdf(spark, sf)
    val dir = tmp()
    GraphIO.saveTriples(g, dir)
    val back = GraphIO.loadTriples(spark, dir)
    assert(back.triples.columns.toSeq == Seq("s", "p", "o"))
    assert(back.triples.count() == g.triples.count())
    val missing = g.triples.join(back.triples, Seq("s", "p", "o"), "left_anti").count()
    assert(missing == 0)
  }

  test("quad snapshot round-trips") {
    val q = QuadStore(Seq(
      ("g1", "s1", "p1", "o1"), ("g1", "s2", "p1", "o2"),
      ("g2", "s1", "p2", "o3")).toDF("g", "s", "p", "o"))
    val dir = tmp()
    GraphIO.saveQuads(q, dir)
    val back = GraphIO.loadQuads(spark, dir)
    assert(back.quads.collect().toSet == q.quads.collect().toSet)
  }

  test("epoch store: triple epochs are isolated immutable snapshots") {
    val dir = tmp()
    val t0 = graft.graph.TripleGraph(
      Seq(("s1", "p1", "o1"), ("s2", "p1", "o2")).toDF("s", "p", "o"))
    val e0 = GraphIO.Epochs.commitTriples(t0, dir)
    val t1 = graft.graph.TripleGraph(t0.triples.unionByName(
      Seq(("s3", "p2", "o3")).toDF("s", "p", "o")))
    val e1 = GraphIO.Epochs.commitTriples(t1, dir)
    assert(GraphIO.Epochs.asOfTriples(spark, dir, e0).triples.count() == 2)
    assert(GraphIO.Epochs.asOfTriples(spark, dir, e1).triples.count() == 3)
    assertThrows[IllegalArgumentException](
      GraphIO.Epochs.asOfTriples(spark, dir, 9L))
    // an EMPTY store round-trips via the fixed reload schema (a partitioned
    // empty write leaves only _SUCCESS — nothing to infer from)
    val e2 = GraphIO.Epochs.commitTriples(
      graft.graph.TripleGraph(t0.triples.limit(0)), dir)
    val empty = GraphIO.Epochs.asOfTriples(spark, dir, e2).triples
    assert(empty.columns.toSeq == Seq("s", "p", "o") && empty.count() == 0)
  }

  test("epoch store: delta epochs replay against the nearest full snapshot") {
    val dir = tmp()
    def tg(rows: (String, String, String)*) =
      graft.graph.TripleGraph(rows.toDF("s", "p", "o"))
    def setOf(e: Long) = GraphIO.Epochs.asOfTriples(spark, dir, e).triples
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val e0 = GraphIO.Epochs.commitTriplesIncremental(
      tg(("a", "p", "1"), ("b", "p", "2")), dir) // first commit = full
    val e1 = GraphIO.Epochs.commitTriplesIncremental(
      tg(("a", "p", "1"), ("c", "p", "3")), dir) // -b +c, delta
    val e2 = GraphIO.Epochs.commitTriplesIncremental(
      tg(("c", "p", "3")), dir)                  // -a, delta on delta
    assert(setOf(e0) == Set(("a", "p", "1"), ("b", "p", "2")))
    assert(setOf(e1) == Set(("a", "p", "1"), ("c", "p", "3")))
    assert(setOf(e2) == Set(("c", "p", "3")))
    // the delta epochs really stored deltas, not snapshots
    assert(new java.io.File(s"$dir/e$e1/_delta").exists)
    assert(!new java.io.File(s"$dir/e$e1/triples").exists)
    // epoch numbers divisible by fullEvery force a fresh full snapshot
    val e3 = GraphIO.Epochs.commitTriplesIncremental(
      tg(("z", "p", "9")), dir, fullEvery = 3)
    assert(e3 == 3L && new java.io.File(s"$dir/e3/triples").exists)
    assert(setOf(e3) == Set(("z", "p", "9")))
    assert(GraphIO.Epochs.latestTriples(spark, dir).triples.count() == 1)
    // a bare delta commit with nothing underneath is rejected
    assertThrows[IllegalArgumentException](
      GraphIO.Epochs.commitTriplesDelta(spark, tmp(),
        tg(("x", "p", "0")).triples, tg().triples))
  }

  test("epoch store: diffTriples is the exact add/remove delta") {
    val dir = tmp()
    val t0 = graft.graph.TripleGraph(
      Seq(("a", "p", "1"), ("b", "p", "2"), ("c", "q", "3")).toDF("s", "p", "o"))
    val e0 = GraphIO.Epochs.commitTriples(t0, dir)
    // e1: drop (b,p,2), add (d,p,4) — (a,p,1)/(c,q,3) unchanged
    val t1 = graft.graph.TripleGraph(
      Seq(("a", "p", "1"), ("c", "q", "3"), ("d", "p", "4")).toDF("s", "p", "o"))
    val e1 = GraphIO.Epochs.commitTriples(t1, dir)
    val d = GraphIO.Epochs.diffTriples(spark, dir, e0, e1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(d == Set(("add", "d", "p", "4"), ("remove", "b", "p", "2")))
    // reversed direction flips the change labels
    val rev = GraphIO.Epochs.diffTriples(spark, dir, e1, e0)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rev == Set(("add", "b"), ("remove", "d")))
    // self-diff is empty
    assert(GraphIO.Epochs.diffTriples(spark, dir, e0, e0).count() == 0)
  }

  test("epoch store: adjacent-delta feeds read the stored delta back; spans replay") {
    val dir = tmp()
    def tg3(rows: (String, String, String)*) =
      graft.graph.TripleGraph(rows.toDF("s", "p", "o"))
    val e0 = GraphIO.Epochs.commitTriplesIncremental(tg3(("a", "p", "1"), ("b", "p", "2")), dir)
    val e1 = GraphIO.Epochs.commitTriplesIncremental(tg3(("a", "p", "1"), ("b", "p", "2"), ("d", "p", "4")), dir)
    val e2 = GraphIO.Epochs.commitTriplesIncremental(tg3(("a", "p", "1"), ("b", "p", "2")), dir)
    assert(new java.io.File(s"$dir/e$e1/_delta").exists)
    def d(from: Long, to: Long) = GraphIO.Epochs.diffTriples(spark, dir, from, to)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // adjacent e0→e1: the delta fast path must equal the replay diff
    assert(d(e0, e1) == Set(("add", "d")))
    assert(d(e1, e2) == Set(("remove", "d")))
    // SPAN e0→e2: d was added then removed — a naive delta concatenation
    // would report both; the replay fallback correctly cancels to empty
    assert(d(e0, e2) == Set.empty)
  }

  test("epoch store: quad epochs commit and as-of read, empty included") {
    val dir = tmp()
    val q0 = QuadStore(Seq(("g1", "s1", "p1", "o1")).toDF("g", "s", "p", "o"))
    val e0 = GraphIO.Epochs.commitQuads(q0, dir)
    val q1 = q0.insert("g2", Seq(("s2", "p2", "o2")).toDF("s", "p", "o"))
    val e1 = GraphIO.Epochs.commitQuads(q1, dir)
    assert(GraphIO.Epochs.asOfQuads(spark, dir, e0).quads.count() == 1)
    val back1 = GraphIO.Epochs.asOfQuads(spark, dir, e1)
    assert(back1.quads.columns.toSeq == Seq("g", "s", "p", "o"))
    assert(back1.quads.count() == 2)
    val e2 = GraphIO.Epochs.commitQuads(q1.drop("g1").drop("g2"), dir)
    val empty = GraphIO.Epochs.asOfQuads(spark, dir, e2).quads
    assert(empty.columns.toSeq == Seq("g", "s", "p", "o") && empty.count() == 0)
  }

  test("csv interchange round-trips nodes, labels, and edge properties") {
    val g = PropertyGraph(
      Seq((1L, Seq("A", "B"), "x"), (2L, Seq("A"), "y")).toDF("id", "labels", "name"),
      Seq((1L, 2L, "R", 3.5)).toDF("src", "dst", "rel", "weight"))
    val dir = tmp()
    GraphIO.toCsv(g, s"$dir/nodes", s"$dir/edges")
    val back = GraphIO.fromCsv(spark, s"$dir/nodes", s"$dir/edges")
    val n = back.nodes.orderBy("id").collect()
    assert(n.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(n.head.getSeq[String](1) == Seq("A", "B"))
    assert(n.head.getString(2) == "x")
    val e = back.edges.collect().head
    assert(e.getLong(0) == 1L && e.getLong(1) == 2L && e.getString(2) == "R")
    assert(e.getDouble(3) == 3.5)
  }

  test("predicate-partitioned triples prune on bound-predicate scans") {
    val g = TpchRdf(spark, sf)
    val dir = tmp()
    GraphIO.saveTriples(g, dir)
    val scan = spark.read.parquet(s"$dir/triples").filter(col("p") === "name")
    val plan = scan.queryExecution.executedPlan.toString
    // partition pruning shows up as a PartitionFilters entry on the scan
    assert(plan.contains("PartitionFilters: [isnotnull(p"), plan.take(500))
  }

  test("epoch store: LPG delta epochs replay and diff as change feeds") {
    val dir = tmp()
    def pg(ns: Seq[(Long, Seq[String], String)], es: Seq[(Long, Long, String)]) =
      PropertyGraph(ns.toDF("id", "labels", "name"), es.toDF("src", "dst", "rel"))
    val g0 = pg(Seq((1L, Seq("A"), "x"), (2L, Seq("A"), "y")), Seq((1L, 2L, "E")))
    val e0 = GraphIO.Epochs.commitIncremental(g0, dir) // first = full
    val g1 = pg(
      Seq((1L, Seq("A"), "x"), (2L, Seq("A"), "y2"), (3L, Seq("B"), "z")),
      Seq((1L, 2L, "E"), (2L, 3L, "F")))
    val e1 = GraphIO.Epochs.commitIncremental(g1, dir) // delta
    assert(new java.io.File(s"$dir/e$e1/_delta").exists)
    assert(!new java.io.File(s"$dir/e$e1/nodes").exists)

    def names(e: Long) = GraphIO.Epochs.asOf(spark, dir, e).nodes
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(names(e0) == Set((1L, "x"), (2L, "y")))
    assert(names(e1) == Set((1L, "x"), (2L, "y2"), (3L, "z")))
    assert(GraphIO.Epochs.latest(spark, dir).edges.count() == 2)

    val nd = GraphIO.Epochs.diffNodes(spark, dir, e0, e1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // node 2's rename is remove(old row) + add(new row); node 3 is a pure add
    assert(nd == Set(("add", 2L), ("add", 3L), ("remove", 2L)))
    val ed = GraphIO.Epochs.diffEdges(spark, dir, e0, e1)
      .collect().map(r => (r.getString(0), r.getString(3))).toSet
    assert(ed == Set(("add", "F")))
  }

  test("N-Triples export → LOAD round-trips term-exact, escapes included") {
    val nasty = Seq(
      ("s:1", "p", "plain value"),
      ("s:2", "p", "with \"quotes\" inside"),
      ("s:3", "p", "back\\slash and trailing \\"),
      ("s:4", "p", "\"both\" \\ mixed \"")).toDF("s", "p", "o")
    val dir = tmp()
    GraphIO.exportNTriples(graft.graph.TripleGraph(nasty), dir)
    val back = QuadStore.empty(spark).load(spark, s"file:$dir", Some("g"))
      .quads.select("s", "p", "o")
    val want = nasty.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val got = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == want)
  }

  test("JSONL export/import round-trips term-exact") {
    val t = TpchRdf(spark, sf).triples
    val dir = tmp()
    GraphIO.exportJsonl(graft.graph.TripleGraph(t), dir)
    val back = GraphIO.importJsonl(spark, dir).triples
    assert(back.count() == t.count())
    assert(t.join(back, Seq("s", "p", "o"), "left_anti").count() == 0)
    assert(back.join(t, Seq("s", "p", "o"), "left_anti").count() == 0)
  }

  test("bucketed store: expand join runs with no exchange on either side") {
    import org.apache.spark.sql.functions._
    val nodes = spark.range(0, 2000).select(col("id"),
      array(lit("N")).as("labels"), (col("id") % 7).as("grp"))
    val edges = spark.range(0, 6000).select((col("id") % 2000).as("src"),
      ((col("id") * 37 + 11) % 2000).as("dst"), lit("E").as("rel"))
    val g = graft.graph.PropertyGraph(nodes, edges)
    val db = "graft_bucket_spec"
    GraphIO.saveBucketed(g, db, tmp(), buckets = 8)
    val back = GraphIO.loadBucketed(spark, db)
    // same rows back
    assert(back.nodes.count() == 2000 && back.edges.count() == 6000)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the assertion is about bucket
      // co-location, not broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val expand = back.edges.join(back.nodes,
        back.edges("src") === back.nodes("id"))
      val plan = expand.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expand join should read co-located buckets, got:\n$plan")
      // out-out chain (two-hop fan-out grouped at the shared source)
      val chain = back.edges.as("a").join(back.edges.as("b"), Seq("src"))
      val chainPlan = chain.queryExecution.executedPlan.toString
      assert(!chainPlan.contains("Exchange hashpartitioning"),
        s"src-src self-join should be exchange-free, got:\n$chainPlan")
      // and the answers match the unbucketed plan
      assert(expand.count() ==
        edges.join(nodes, edges("src") === nodes("id")).count())
      // in-direction expand through the dst-clustered mirror (backward
      // adjacency): the expand API routes the dst-side step to edges_by_dst,
      // so the dst = id join is also exchange-free
      val inExpand = back.expand(back.nodes.select(col("id")), "id",
        Seq("E"), graft.graph.In, dstAs = "nbr")
      val inPlan = inExpand.queryExecution.executedPlan.toString
      assert(!inPlan.contains("Exchange hashpartitioning"),
        s"in-expand should read the dst-clustered mirror, got:\n$inPlan")
      assert(inExpand.count() ==
        edges.join(nodes, edges("dst") === nodes("id")).count())
      // mutation drops the mirror: a copy() graph must fall back to `edges`
      val mutated = back.copy(edges = back.edges.limit(10))
      assert(mutated.edgesByDst.isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("edge-list export writes one parseable line per edge") {
    val g = TpchGraph.partDagCapped(spark, sf, 50)
    val dir = tmp()
    GraphIO.exportEdgeList(g, dir)
    val lines = spark.read.text(dir)
    assert(lines.count() == g.edges.count())
    val parts = lines.select(split(col("value"), "\t").as("f"))
      .select(col("f")(0).cast("long").as("src"), col("f")(1).cast("long").as("dst"),
        col("f")(2).as("rel"), col("f")(3).cast("double").as("w"))
    assert(parts.filter(col("src").isNull || col("dst").isNull || col("w").isNull)
      .count() == 0)
    // content matches the graph's edge bag
    val back = parts.select(col("src"), col("dst"))
    assert(back.join(g.edges.select("src", "dst"), Seq("src", "dst"), "left_anti")
      .count() == 0)
  }

  test("node-link JSON round-trips through a JSON reader and bounds enforce") {
    val g = TpchGraph.partDagCapped(spark, sf, 20)
    val json = GraphIO.toNodeLinkJson(g, maxNodes = 100)
    val parsed = spark.read.json(Seq(json).toDS())
    val row = parsed.select(size(col("nodes")).as("n"), size(col("links")).as("m"),
      col("directed")).collect().head
    assert(row.getInt(0) == g.nodes.count())
    assert(row.getInt(1) == g.edges.count())
    assert(row.getBoolean(2))
    val err = intercept[IllegalArgumentException] {
      GraphIO.toNodeLinkJson(g, maxNodes = 3)
    }
    assert(err.getMessage.contains("bounded"))
  }
}
