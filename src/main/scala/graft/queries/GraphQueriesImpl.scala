package graft.queries

import org.apache.spark.sql.functions._
import graft.graph.{Both, In, L, Out, TpchGraph, TpchRdf, TriplePattern, V}

/** Graph operator coverage (SURVEY.md §2.1 graph ops) over the deterministic
  * TPC-H-derived property graph — every query has a plain-SQL oracle on the
  * base tables.
  */
object GraphQueriesImpl {

  /** The part DAG (TpchGraph.partDag) as a DuckDB CTE. */
  private val DagSql =
    """dag AS (
      |  SELECT a.p_partkey AS src, b.p_partkey AS dst
      |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey AND a.p_partkey >= 1
      |  UNION ALL
      |  SELECT a.p_partkey, b.p_partkey
      |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey + 1 AND a.p_partkey >= 1
      |  UNION ALL
      |  SELECT a.p_partkey, b.p_partkey
      |  FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
      |)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Expand, 1 hop out (plan.rs:180-212): Customer -FROM_NATION-> Nation.
    QueryDef(
      "q_expand_1hop",
      """SELECT c_name AS cust, n_name AS nat
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 7000.0
        |ORDER BY cust NULLS FIRST""".stripMargin) { (s, dir) =>
      val g = TpchGraph(s, dir)
      val rows = g.nodesWithLabel("Customer")
        .filter(col("acctbal") > 7000.0)
        .select(col("id").as("cid"), col("name").as("cust"))
      val expanded = g.expand(rows, "cid", Seq("FROM_NATION"), Out, "nid")
      expanded.join(g.nodes.select(col("id").as("nid"), col("name").as("nat")), "nid")
        .select("cust", "nat")
        .orderBy("cust")
    },

    // Expand chain, 2 hops (ExpandOperator chained; the reference's 2-hop
    // bench shape performance.md:68): Customer -> Nation -> Region.
    QueryDef(
      "q_expand_2hop",
      """SELECT c_name AS cust, r_name AS reg
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_custkey < 50
        |ORDER BY cust NULLS FIRST""".stripMargin) { (s, dir) =>
      val g = TpchGraph(s, dir)
      val rows = g.nodesWithLabel("Customer")
        .filter(TpchGraph.key(col("id")) < 50)
        .select(col("id").as("cid"), col("name").as("cust"))
      val h1 = g.expand(rows, "cid", Seq("FROM_NATION"), Out, "nid")
      val h2 = g.expand(h1, "nid", Seq("IN_REGION"), Out, "rid")
      h2.join(g.nodes.select(col("id").as("rid"), col("name").as("reg")), "rid")
        .select("cust", "reg")
        .orderBy("cust")
    },

    // Expand, direction Both (plan.rs:188-199): neighbor count per nation =
    // out (region) + in (customers + suppliers).
    QueryDef(
      "q_expand_both",
      """SELECT CAST(n_nationkey AS BIGINT) AS k,
        |       CAST(1 + (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey)
        |              + (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey)
        |            AS BIGINT) AS nb
        |FROM nation
        |ORDER BY k NULLS FIRST""".stripMargin) { (s, dir) =>
      val g = TpchGraph(s, dir)
      val nations = g.nodesWithLabel("Nation").select(col("id").as("nid"))
      g.expand(nations, "nid", Nil, Both, "nb_id")
        .groupBy(TpchGraph.key(col("nid")).as("k"))
        .agg(count(lit(1)).as("nb"))
        .orderBy("k")
    },

    // VariableLengthExpand (plan.rs:180-212 min/max hops;
    // variable_length_expand.rs): walks 1..3 from part roots 1..3, bag
    // semantics — one row per walk, counted per (src, dst, hops).
    QueryDef(
      "q_varlen_paths",
      s"""WITH RECURSIVE $DagSql,
        |walk(src, dst, hops) AS (
        |  SELECT src, dst, 1 FROM dag WHERE src BETWEEN 1 AND 3
        |  UNION ALL
        |  SELECT w.src, d.dst, w.hops + 1 FROM walk w JOIN dag d ON d.src = w.dst
        |  WHERE w.hops < 3
        |)
        |SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst, hops,
        |       count(*) AS n_walks
        |FROM walk GROUP BY src, dst, hops
        |ORDER BY src NULLS FIRST, dst NULLS FIRST, hops NULLS FIRST""".stripMargin) { (s, dir) =>
      val g = TpchGraph.partDag(s, dir)
      val sources = g.nodes.filter(col("id").between(1, 3)).select(col("id").as("src"))
      g.varLengthExpand(sources, "src", Seq("LINK"), 1, 3)
        .groupBy("src", "dst", "hops")
        .agg(count(lit(1)).as("n_walks"))
        .orderBy("src", "dst", "hops")
    },

    // Factorized multi-hop aggregate (FactorizedChunk factorized_chunk.rs:
    // 1-52; FactorizedAggregateOperator factorized_aggregate.rs:229): 3-hop
    // walk count + terminal-id sum per source WITHOUT materializing walks —
    // the multiplicity recursion cnt_k(v) = Σ_{w∈N(v)} cnt_{k-1}(w). The
    // oracle is the flat 3-join plan; equality IS the factorization proof.
    QueryDef(
      "q_factorized_agg",
      s"""WITH $DagSql
        |SELECT CAST(e1.src AS BIGINT) AS id,
        |       count(*) AS walks,
        |       CAST(sum(e3.dst) AS BIGINT) AS total
        |FROM dag e1 JOIN dag e2 ON e2.src = e1.dst
        |            JOIN dag e3 ON e3.src = e2.dst
        |GROUP BY 1
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      TpchGraph.partDag(s, dir)
        .factorizedWalkAgg(hops = 3, rels = Seq("LINK"), sumProp = Some("id"))
        .orderBy("id")
    },

    // ShortestPath (plan.rs:579-598; shortest_path.rs BFS): min-hop distance
    // from part 1 to every node <= 200 within 6 hops.
    QueryDef(
      "q_shortest_path",
      s"""WITH RECURSIVE $DagSql,
        |walk(dst, hops) AS (
        |  SELECT dst, 1 FROM dag WHERE src = 1 AND dst <= 200
        |  UNION ALL
        |  SELECT d.dst, w.hops + 1 FROM walk w JOIN dag d ON d.src = w.dst
        |  WHERE w.hops < 6 AND d.dst <= 200
        |)
        |SELECT CAST(dst AS BIGINT) AS dst, CAST(min(hops) AS INTEGER) AS dist
        |FROM walk GROUP BY dst
        |ORDER BY dst NULLS FIRST""".stripMargin) { (s, dir) =>
      val g = TpchGraph.partDag(s, dir)
      val sources = g.nodes.filter(col("id") === 1).select(col("id").as("root"))
      g.bfs(sources, "root", Seq("LINK"), maxDepth = 6,
          filterNodes = Some(col("__node") <= 200))
        .select(col("dst"), col("dist"))
        .orderBy("dst")
    },

    // Degree centrality (algorithms/centrality.rs:49) on the heterogeneous
    // graph, reported for Nation nodes.
    QueryDef(
      "q_degree",
      """SELECT CAST(n_nationkey AS BIGINT) AS k,
        |       CAST(1 AS BIGINT) AS outdeg,
        |       CAST((SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey)
        |          + (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey)
        |            AS BIGINT) AS indeg
        |FROM nation
        |ORDER BY k NULLS FIRST""".stripMargin) { (s, dir) =>
      val g = TpchGraph(s, dir)
      g.degrees
        .filter((col("id") / TpchGraph.Stride).cast("long") === TpchGraph.NationTag)
        .select(TpchGraph.key(col("id")).as("k"), col("outdeg"), col("indeg"))
        .orderBy("k")
    },

    // Edge-property aggregation over the graph (CONTAINS carries l_quantity
    // as weight): total shipped quantity per part.
    QueryDef(
      "q_edge_props",
      """SELECT CAST(l_partkey AS BIGINT) AS pk,
        |       round(sum(l_quantity), 2) AS qty, count(*) AS n
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY pk NULLS FIRST""".stripMargin) { (s, dir) =>
      val g = TpchGraph(s, dir)
      g.edgesOfType("CONTAINS")
        .groupBy(TpchGraph.key(col("dst")).as("pk"))
        .agg(round(sum(col("weight")), 2).as("qty"), count(lit(1)).as("n"))
        .orderBy("pk")
    },

    // TripleScan + BGP self-joins (plan.rs:480-503; SPARQL planner BGP):
    // ?c inNation ?n . ?n name 'NATION_3' . ?c segment 'BUILDING'
    QueryDef(
      "q_rdf_bgp",
      """SELECT 'c:' || c_custkey AS c
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3' AND c_mktsegment = 'BUILDING'
        |ORDER BY c NULLS FIRST""".stripMargin) { (s, dir) =>
      val rdf = TpchRdf(s, dir)
      rdf.bgp(Seq(
          TriplePattern(V("c"), L("inNation"), V("n")),
          TriplePattern(V("n"), L("name"), L("NATION_3")),
          TriplePattern(V("c"), L("segment"), L("BUILDING"))))
        .select("c")
        .orderBy("c")
    },

    // Bucketed store round-trip (GraphIO.saveBucketed): nodes bucketed by
    // id, edges by src, so the reloaded expand join reads co-located
    // buckets with no exchange (plan shape pinned in GraphIOSpec) — the
    // write-once-shuffle storage layout for 100 TB traversals.
    QueryDef(
      "q_bucketed_expand",
      """SELECT r_name AS region, CAST(count(*) AS BIGINT) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY region NULLS FIRST""".stripMargin) { (s, dir) =>
      val back = bucketedRegionGraph(s, dir)
      back.edges.join(back.nodes, back.edges("src") === back.nodes("id"))
        .groupBy(col("name").as("region"))
        .agg(count(lit(1)).as("n"))
        .select(col("region"), col("n"))
        .orderBy(col("region").asc_nulls_first)
    },

    // In-direction hop through the dst-clustered mirror (backward
    // adjacency, ref store.rs:241-246): expand(In) from each Nation to its
    // Region routes the dst-side join to edges_by_dst — exchange-free like
    // the forward hop (plan pinned in GraphIOSpec).
    QueryDef(
      "q_bucketed_expand_in",
      """SELECT CAST(n_nationkey AS BIGINT) AS nation_id,
        |       CAST(n_regionkey + 1000000 AS BIGINT) AS region_id
        |FROM nation
        |ORDER BY nation_id NULLS FIRST""".stripMargin) { (s, dir) =>
      val back = bucketedRegionGraph(s, dir)
      val nations = back.nodes.filter(array_contains(col("labels"), "Nation"))
        .select(col("id").as("nation_id"))
      back.expand(nations, "nation_id", Seq("HAS_NATION"), graft.graph.In,
          dstAs = "region_id")
        .select(col("nation_id"), col("region_id"))
        .orderBy(col("nation_id").asc_nulls_first)
    },
  )

  /** Region→Nation graph saved+reloaded through the bucketed store. One
    * DETERMINISTIC location + db per sf dir, DROPped (CASCADE) before each
    * rebuild — a fresh temp dir per invocation would be ignored by
    * `CREATE DATABASE IF NOT EXISTS` and orphan a directory per run.
    */
  private def bucketedRegionGraph(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.graph.PropertyGraph = {
    val nation = graft.core.Tables.nation(s, dir)
    val region = graft.core.Tables.region(s, dir)
    val nodes = region.select((col("r_regionkey").cast("long") + 1000000L).as("id"),
        array(lit("Region")).as("labels"), col("r_name").as("name"))
      .unionByName(nation.select(col("n_nationkey").cast("long").as("id"),
        array(lit("Nation")).as("labels"), col("n_name").as("name")))
    val edges = nation.select(
      (col("n_regionkey").cast("long") + 1000000L).as("src"),
      col("n_nationkey").cast("long").as("dst"), lit("HAS_NATION").as("rel"))
    val db = "graft_bucketed_q"
    val loc = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_bq_${dir.hashCode.toHexString}")
    s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    // the in-memory catalog dies with the session but managed-table files
    // don't: a leftover location from a previous process would fail the
    // saveAsTable with LOCATION_ALREADY_EXISTS — clear it too
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    graft.sources.GraphIO.saveBucketed(
      graft.graph.PropertyGraph(nodes, edges), db, loc.toString, buckets = 4)
    graft.sources.GraphIO.loadBucketed(s, db)
  }
}
