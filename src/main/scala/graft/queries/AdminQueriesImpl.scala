package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.graph.TpchGraph

/** Admin / introspection coverage: database stats, schema info,
  * referential-integrity validation, and the property-value index
  * (reference database.rs:998-1475, admin.rs:32-198).
  */
object AdminQueriesImpl {

  def defs: Seq[QueryDef] = Seq(

    // detailed_stats (database.rs:1318): every metric is a distributed
    // aggregation over the fixture graph, so each one is SQL-predictable
    // from the base tables it was derived from.
    QueryDef(
      "q_db_stats",
      """SELECT metric, value FROM (
        |  SELECT 'node_count' AS metric,
        |         CAST((SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
        |            + (SELECT count(*) FROM supplier) + (SELECT count(*) FROM customer)
        |            + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders) AS BIGINT) AS value
        |  UNION ALL
        |  SELECT 'edge_count',
        |         (SELECT count(*) FROM nation) + (SELECT count(*) FROM customer)
        |       + (SELECT count(*) FROM supplier) + (SELECT count(*) FROM orders)
        |       + (SELECT count(*) FROM lineitem)
        |       + (SELECT count(*) FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem))
        |  UNION ALL SELECT 'label_count', 6
        |  UNION ALL SELECT 'edge_type_count', 5
        |  UNION ALL SELECT 'property_key_count', 4
        |)
        |ORDER BY metric NULLS FIRST""".stripMargin) { (s, dir) =>
      new GraftSession(s, TpchGraph(s, dir)).stats
    },

    // schema() (database.rs:1365): per-label node counts and per-type edge
    // counts — the LpgSchemaInfo rows (admin.rs:72-98), each predictable
    // from its source table.
    QueryDef(
      "q_db_schema",
      """SELECT kind, name, count FROM (
        |  SELECT 'label' AS kind, 'Region' AS name, CAST((SELECT count(*) FROM region) AS BIGINT) AS count
        |  UNION ALL SELECT 'label', 'Nation', (SELECT count(*) FROM nation)
        |  UNION ALL SELECT 'label', 'Supplier', (SELECT count(*) FROM supplier)
        |  UNION ALL SELECT 'label', 'Customer', (SELECT count(*) FROM customer)
        |  UNION ALL SELECT 'label', 'Part', (SELECT count(*) FROM part)
        |  UNION ALL SELECT 'label', 'Order', (SELECT count(*) FROM orders)
        |  UNION ALL SELECT 'edge_type', 'IN_REGION', (SELECT count(*) FROM nation)
        |  UNION ALL SELECT 'edge_type', 'FROM_NATION',
        |            (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
        |  UNION ALL SELECT 'edge_type', 'PLACED_BY', (SELECT count(*) FROM orders)
        |  UNION ALL SELECT 'edge_type', 'CONTAINS', (SELECT count(*) FROM lineitem)
        |  UNION ALL SELECT 'edge_type', 'SUPPLIES',
        |            (SELECT count(*) FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem))
        |)
        |ORDER BY kind NULLS FIRST, name NULLS FIRST""".stripMargin) { (s, dir) =>
      new GraftSession(s, TpchGraph(s, dir)).schemaInfo
    },

    // validate() (database.rs:1432) on a deliberately broken graph: drop
    // every Part node but keep the edges — each CONTAINS and SUPPLIES edge
    // now dangles on its destination, so DANGLING_DST is exactly the
    // lineitem-derived edge count and DANGLING_SRC stays zero.
    QueryDef(
      "q_db_validate",
      """SELECT kind, code, n FROM (
        |  SELECT 'error' AS kind, 'DANGLING_DST' AS code,
        |         CAST((SELECT count(*) FROM lineitem)
        |            + (SELECT count(*) FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)) AS BIGINT) AS n
        |  UNION ALL SELECT 'error', 'DANGLING_SRC', 0
        |  UNION ALL SELECT 'warning', 'NO_EDGES', 0
        |)
        |ORDER BY kind NULLS FIRST, code NULLS FIRST""".stripMargin) { (s, dir) =>
      val base = TpchGraph(s, dir)
      val broken = graft.graph.PropertyGraph(
        base.nodes.filter(!array_contains(col("labels"), "Part")),
        base.edges)
      new GraftSession(s, broken).validate
    },

    // rdf_schema() (database.rs:1400; RdfSchemaInfo admin.rs:101-119):
    // per-predicate triple counts plus distinct subject/object totals —
    // the oracle mirrors the triple construction exactly (union of the
    // same term families, distinct-counted).
    QueryDef(
      "q_rdf_schema",
      """SELECT kind, name, count FROM (
        |  SELECT 'predicate' AS kind, 'name' AS name,
        |         CAST((SELECT count(*) FROM customer) + (SELECT count(*) FROM nation)
        |            + (SELECT count(*) FROM supplier) AS BIGINT) AS count
        |  UNION ALL SELECT 'predicate', 'segment', (SELECT count(*) FROM customer)
        |  UNION ALL SELECT 'predicate', 'inNation',
        |            (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
        |  UNION ALL SELECT 'summary', 'subject_count',
        |    (SELECT count(DISTINCT s) FROM (
        |       SELECT 'c:' || c_custkey AS s FROM customer
        |       UNION ALL SELECT 'n:' || n_nationkey FROM nation
        |       UNION ALL SELECT 's:' || s_suppkey FROM supplier))
        |  UNION ALL SELECT 'summary', 'object_count',
        |    (SELECT count(DISTINCT o) FROM (
        |       SELECT c_name AS o FROM customer
        |       UNION ALL SELECT c_mktsegment FROM customer
        |       UNION ALL SELECT 'n:' || c_nationkey FROM customer
        |       UNION ALL SELECT n_name FROM nation
        |       UNION ALL SELECT s_name FROM supplier
        |       UNION ALL SELECT 'n:' || s_nationkey FROM supplier))
        |)
        |ORDER BY kind NULLS FIRST, name NULLS FIRST""".stripMargin) { (s, dir) =>
      graft.graph.Admin.rdfSchemaInfo(graft.graph.TpchRdf(s, dir).triples)
    },

    // Dump-format round-trip (reference DumpFormat Parquet|Turtle|Json,
    // admin.rs; CLI backup/data commands): export the customer-segment
    // triples as N-Triples AND as JSON-Lines, re-import both, and count
    // per (format, predicate) — both registers must reproduce the exact
    // triple multiset the parquet-born store carries.
    QueryDef(
      "q_rdf_export",
      """SELECT fmt, p, n FROM (
        |  SELECT 'jsonl' AS fmt, 'segment' AS p,
        |         CAST((SELECT count(*) FROM customer) AS BIGINT) AS n
        |  UNION ALL SELECT 'nt', 'segment', (SELECT count(*) FROM customer)
        |)
        |ORDER BY fmt NULLS FIRST, p NULLS FIRST""".stripMargin) { (s, dir) =>
      import graft.sources.GraphIO
      val seg = graft.graph.TripleGraph(
        graft.graph.TpchRdf(s, dir).triples.filter(col("p") === "segment"))
      val ntDir = java.nio.file.Files.createTempDirectory("graft_nt").toString
      val jsDir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
      GraphIO.exportNTriples(seg, ntDir)
      GraphIO.exportJsonl(seg, jsDir)
      val viaNt = graft.graph.QuadStore.empty(s)
        .load(s, s"file:$ntDir", Some("nt")).quads
        .select(lit("nt").as("fmt"), col("p"))
      val viaJs = GraphIO.importJsonl(s, jsDir).triples
        .select(lit("jsonl").as("fmt"), col("p"))
      viaNt.unionByName(viaJs)
        .groupBy("fmt", "p").agg(count(lit(1)).as("n"))
        .orderBy("fmt", "p")
    },

    // Property index (database.rs:998/1270): index the shared `category`
    // column (Customer mktsegment / Part brand / Order status), then point
    // lookups through the sorted projection. The id_sum checksum proves the
    // index returns the exact node-id sets, not just the right counts —
    // ids are table key + label tag stride (TpchGraph.gid).
    QueryDef(
      "q_property_index",
      """SELECT v, n, id_sum FROM (
        |  SELECT 'BUILDING' AS v, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(4000000000000 + c_custkey) AS BIGINT) AS id_sum
        |  FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT 'F', count(*), CAST(sum(6000000000000 + o_orderkey) AS BIGINT)
        |  FROM orders WHERE o_orderstatus = 'F'
        |)
        |ORDER BY v NULLS FIRST""".stripMargin) { (s, dir) =>
      val session = new GraftSession(s, TpchGraph(s, dir))
      if (!session.hasPropertyIndex("category")) {
        val idxDir = java.nio.file.Files.createTempDirectory("graft_propidx").toString
        session.createPropertyIndex("category", idxDir)
      }
      Seq("BUILDING", "F").map { v =>
        session.findNodesByProperty("category", v)
          .select(lit(v).as("v"), col("id"))
      }.reduce(_ unionByName _)
        .groupBy("v")
        .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
        .orderBy("v")
    },
  )
}
