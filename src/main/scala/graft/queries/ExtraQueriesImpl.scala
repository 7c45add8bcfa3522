package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.algos.Algos
import graft.core.Tables
import graft.graph.{L, PropertyGraph, TpchGraph, TpchRdf, TriplePattern, V}

/** Second-wave coverage: Cypher WITH pipelines, JSON property access, SCC,
  * topological levels, bounded closeness, SPARQL UPDATE (Modify).
  */
object ExtraQueriesImpl {

  /** Same-brand chain, bidirectional (cyclic) — SCCs = brand islands. */
  private def brandCycleGraph(s: org.apache.spark.sql.SparkSession, dir: String): PropertyGraph = {
    val p = Tables.part(s, dir).select(col("p_partkey").as("k"), col("p_brand").as("brand"))
    val nxt = p.select(col("k").as("k2"), col("brand").as("brand2"))
    val fwd = p.join(nxt, col("k2") === col("k") + 1 && col("brand2") === col("brand"))
      .select(col("k").as("src"), col("k2").as("dst"))
    val edges = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .withColumn("rel", lit("B")).withColumn("weight", lit(1.0))
    val nodes = p.select(col("k").as("id"), array(lit("Part")).as("labels"))
    PropertyGraph(nodes, edges)
  }

  def defs: Seq[QueryDef] = Seq(

    // Cypher WITH pipeline: aggregate mid-query, filter on the aggregate
    // (HAVING through WITH … WHERE), then terminal RETURN.
    QueryDef(
      "q_cypher_with",
      """SELECT n_name AS nat, count(*) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |HAVING count(*) >= 50
        |ORDER BY cnt DESC, nat NULLS FIRST""".stripMargin) { (s, dir) =>
      new GraftSession(s, TpchGraph(s, dir)).cypher(
        """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
          |WITH n.name AS nat, count(*) AS cnt WHERE cnt >= 50
          |RETURN nat, cnt ORDER BY cnt DESC, nat""".stripMargin)
    },

    // JSON property access on the events props column (the schemaless
    // property fallback of SURVEY §1.3 — map/JSON column + extraction).
    QueryDef(
      "q_json_props",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS kmod,
        |       count(*) AS n
        |FROM events
        |GROUP BY 1
        |ORDER BY kmod NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select((get_json_object(col("props"), "$.k").cast("long") % 10).as("kmod"))
        .groupBy("kmod")
        .agg(count(lit(1)).as("n"))
        .orderBy("kmod")
    },

    // SCC (components.rs:171) on a cyclic graph: bidirectional same-brand
    // chains — SCCs are exactly the brand islands (gaps-and-islands oracle).
    QueryDef(
      "q_scc",
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |       CAST(min(p_partkey) OVER (PARTITION BY p_brand, p_partkey - rn) AS BIGINT) AS component
        |FROM (SELECT p_partkey, p_brand,
        |             row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn
        |      FROM part)
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      Algos.stronglyConnectedComponents(s, brandCycleGraph(s, dir))
        .orderBy("id")
    },

    // Topological levels (components.rs:302) on the binary tree: level(k) =
    // floor(log2(k)) — closed-form oracle.
    QueryDef(
      "q_topo_levels",
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |       CAST(CASE WHEN p_partkey >= 1 THEN floor(log2(p_partkey)) ELSE 0 END AS INT) AS level
        |FROM part
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir).select(col("p_partkey").as("k"))
      val dst = p.select(col("k").as("k2"))
      def j(c: org.apache.spark.sql.Column) =
        p.join(dst, c).select(col("k").as("src"), col("k2").as("dst"),
          lit("T").as("rel"), lit(1.0).as("weight"))
      val tree = j(col("k2") === col("k") * 2 && col("k") >= 1)
        .unionByName(j(col("k2") === col("k") * 2 + 1 && col("k") >= 1))
      val nodes = p.select(col("k").as("id"), array(lit("Part")).as("labels"))
      // fixed iteration cap + convergence detection — no driver-side action
      // before the plan builds (a scalar max() here forced an extra job;
      // below the broadcast threshold the single-stage strategy converges
      // via its changed-flag at no per-level cost anyway)
      Algos.topoLevels(PropertyGraph(nodes, tree), maxIters = 64)
        .select(col("id"), col("level").cast("int").as("level"))
        .orderBy("id")
    },

    // Bounded closeness centrality (centrality.rs:350): sources 1..10 on the
    // part DAG, 4-hop horizon.
    QueryDef(
      "q_closeness",
      """WITH RECURSIVE dag AS (
        |  SELECT a.p_partkey AS src, b.p_partkey AS dst
        |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey AND a.p_partkey >= 1
        |  UNION ALL
        |  SELECT a.p_partkey, b.p_partkey
        |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey + 1 AND a.p_partkey >= 1
        |  UNION ALL
        |  SELECT a.p_partkey, b.p_partkey
        |  FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
        |),
        |walk(s, dst, hops) AS (
        |  SELECT src, dst, 1 FROM dag WHERE src BETWEEN 1 AND 10
        |  UNION ALL
        |  SELECT w.s, d.dst, w.hops + 1 FROM walk w JOIN dag d ON d.src = w.dst
        |  WHERE w.hops < 4
        |),
        |dists AS (SELECT s, dst, min(hops) AS dist FROM walk GROUP BY s, dst)
        |SELECT CAST(s AS BIGINT) AS root, count(*) AS reached,
        |       round(count(*) * 1.0 / sum(dist), 6) AS closeness
        |FROM dists GROUP BY s
        |ORDER BY root NULLS FIRST""".stripMargin) { (s, dir) =>
      val g = TpchGraph.partDag(s, dir)
      val sources = g.nodes.filter(col("id").between(1, 10)).select(col("id").as("root"))
      Algos.boundedCloseness(g, sources, "root", Seq("LINK"), maxDepth = 4)
        .orderBy("root")
    },

    // SPARQL Modify (plan.rs:631-663): retag BUILDING customers as RETAIL —
    // WHERE evaluated once, delete then insert from the same bindings.
    QueryDef(
      "q_rdf_update",
      """SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'RETAIL'
        |            ELSE c_mktsegment END AS seg,
        |       count(*) AS n
        |FROM customer
        |GROUP BY 1
        |ORDER BY seg NULLS FIRST""".stripMargin) { (s, dir) =>
      val rdf = TpchRdf(s, dir)
      val updated = rdf.modify(
        where = Seq(TriplePattern(V("c"), L("segment"), L("BUILDING"))),
        deleteTpl = Seq(TriplePattern(V("c"), L("segment"), L("BUILDING"))),
        insertTpl = Seq(TriplePattern(V("c"), L("segment"), L("RETAIL"))))
      updated.triples.filter(col("p") === "segment")
        .groupBy(col("o").as("seg"))
        .agg(count(lit(1)).as("n"))
        .orderBy("seg")
    },
  )
}
