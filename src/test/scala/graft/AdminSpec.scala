package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.{Admin, PropertyGraph, PropertyIndexes, TpchGraph}

/** Admin/introspection surface (reference database.rs:1302-1475) and the
  * property-value index (database.rs:998/1270).
  */
class AdminSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val g = TpchGraph(spark, sf)

  test("stats reports the five DatabaseStats metrics") {
    val m = new GraftSession(spark, g).stats.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet == Set("node_count", "edge_count", "label_count",
      "edge_type_count", "property_key_count"))
    assert(m("label_count") == 6)
    assert(m("edge_type_count") == 5)
    // name, acctbal, category + edge weight
    assert(m("property_key_count") == 4)
    assert(m("node_count") == g.nodes.count())
    assert(m("edge_count") == g.edges.count())
  }

  test("stats counts dynamic props map keys once across typed and dynamic") {
    val nodes = g.nodes.limit(10)
      .withColumn("props", map(lit("name"), lit("x"), lit("extra"), lit("y")))
    val dyn = PropertyGraph(nodes, g.edges.limit(5))
    val m = Admin.stats(dyn).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // typed {name, acctbal, category, weight} ∪ dynamic {name, extra} = 5
    assert(m("property_key_count") == 5)
  }

  test("schemaInfo lists per-label and per-edge-type counts") {
    val rows = new GraftSession(spark, g).schemaInfo.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows(("label", "Region")) == 5)
    assert(rows(("edge_type", "IN_REGION")) == 25)
    assert(rows.keys.count(_._1 == "label") == 6)
    assert(rows.keys.count(_._1 == "edge_type") == 5)
  }

  test("validate is clean on the fixture graph and counts dangling endpoints") {
    val clean = new GraftSession(spark, g).validate.collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(clean == Map("DANGLING_SRC" -> 0L, "DANGLING_DST" -> 0L, "NO_EDGES" -> 0L))

    val broken = PropertyGraph(
      g.nodes.filter(!array_contains(col("labels"), "Region")),
      g.edges)
    val b = Admin.validate(broken).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(b("DANGLING_DST") == 25) // the 25 IN_REGION edges lost their dst
    assert(b("DANGLING_SRC") == 0)

    val lonely = PropertyGraph(g.nodes.limit(3), g.edges.limit(0))
    val w = Admin.validate(lonely).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(w("NO_EDGES") == 1)
  }

  test("rdfSchemaInfo reports named-graph rows for quad stores") {
    import graft.graph.QuadStore
    val quads = TestSpark.spark.range(4).selectExpr(
      "concat('s:', id) AS s", "'p' AS p", "concat('o:', id) AS o",
      "CASE WHEN id < 3 THEN 'g:a' ELSE 'g:b' END AS g")
    val rows = Admin.rdfSchemaInfo(QuadStore(quads).quads).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows(("named_graph", "g:a")) == 3)
    assert(rows(("named_graph", "g:b")) == 1)
    assert(rows(("summary", "subject_count")) == 4)
  }

  test("queryScalar returns the first column of the first row") {
    val n = new GraftSession(spark, g)
      .queryScalar("MATCH (r:Region) RETURN count(*) AS n")
    assert(n == 5L)
  }

  test("property index returns exactly the scan-equivalent id set") {
    val dir = java.nio.file.Files.createTempDirectory("adminspec_idx").toString
    val session = new GraftSession(spark, g)
    assert(!session.hasPropertyIndex("category"))
    session.createPropertyIndex("category", dir)
    assert(session.hasPropertyIndex("category"))

    val viaIndex = session.findNodesByProperty("category", "BUILDING")
      .collect().map(_.getLong(0)).sorted
    val viaScan = g.nodes.filter(col("category") === "BUILDING")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(viaIndex.nonEmpty && viaIndex.sameElements(viaScan))

    assert(session.dropPropertyIndex("category"))
    assert(!session.hasPropertyIndex("category"))
    // fallback path (no index) still answers, via full scan
    val fallback = session.findNodesByProperty("category", "BUILDING")
      .collect().map(_.getLong(0)).sorted
    assert(fallback.sameElements(viaScan))
  }

  test("index lookup pushes the predicate into the sorted projection scan") {
    val dir = java.nio.file.Files.createTempDirectory("adminspec_idx2").toString
    val idx = PropertyIndexes.create(g, "name", dir)
    val p = idx.find("ASIA").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters:") && p.contains("ASIA"),
      s"equality must reach the parquet scan of the index projection:\n$p")
  }
}
