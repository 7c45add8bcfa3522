package graft.queries

import org.apache.spark.sql.functions._
import graft.graph.{Mutations, TpchGraph}

/** Mutation operator coverage (plan.rs:393-475, 558-576): each query applies
  * a functional mutation to the TPC-H graph and projects a result the oracle
  * reconstructs in plain SQL over the base tables.
  */
object MutationQueriesImpl {

  def defs: Seq[QueryDef] = Seq(

    // Schemaless property fallback (SURVEY §1.3 hybrid; reference Value map,
    // graph/lpg/store.rs:176-182): CREATE with keys outside the typed schema
    // routes them into the `props` map column; reads fall back to
    // element_at, filters on dynamic keys still work; SET on a dynamic key
    // writes through the same map.
    QueryDef(
      "q_dynamic_props",
      """SELECT r_name AS nm, CAST(r_regionkey AS VARCHAR) AS rc,
        |       CASE WHEN r_regionkey = 1 THEN 'hot' ELSE 'c' || r_regionkey END AS cx
        |FROM region
        |WHERE r_regionkey <> 2
        |ORDER BY nm NULLS FIRST""".stripMargin) { (s, dir) =>
      val g = TpchGraph(s, dir)
      val widgets = graft.core.Tables.region(s, dir).select(
        (lit(9L * TpchGraph.Stride) + col("r_regionkey")).as("id"),
        array(lit("Widget")).as("labels"),
        col("r_name").as("name"),
        col("r_regionkey").cast("string").as("rcode"),
        concat(lit("c"), col("r_regionkey")).as("colorx"))
      val g2 = Mutations.createNodes(g, widgets)
      val g3 = Mutations.setNodeProperty(g2,
        array_contains(col("labels"), "Widget") && col("props")("rcode") === "1",
        "colorx", lit("hot"))
      new graft.GraftSession(s, g3).cypher(
        """MATCH (w:Widget)
          |WHERE w.rcode <> '2'
          |RETURN w.name AS nm, w.rcode AS rc, w.colorx AS cx
          |ORDER BY nm""".stripMargin)
    },

    // GQL INSERT (gql_translator.rs; gql ast.rs insert statements) through
    // the GQL front-end: insert a node, read it back via a GQL MATCH.
    QueryDef(
      "q_gql_insert",
      """SELECT nm, CAST(bal AS DOUBLE) AS bal FROM (
        |  SELECT 'gql_hub' AS nm, 123.5 AS bal
        |  UNION ALL
        |  SELECT c_name, c_acctbal FROM customer WHERE c_acctbal > 9900.0
        |)
        |ORDER BY nm NULLS FIRST""".stripMargin) { (s, dir) =>
      val sess = new graft.GraftSession(s, TpchGraph(s, dir))
      val g2 = sess.gqlUpdate(
        "INSERT (:Hub {id: 999, name: 'gql_hub', acctbal: 123.5})")
      new graft.GraftSession(s, g2).gql(
        """MATCH (n)
          |WHERE (hasLabel(n, 'Customer') AND n.acctbal > 9900.0) OR hasLabel(n, 'Hub')
          |RETURN n.name AS nm, n.acctbal AS bal
          |ORDER BY nm""".stripMargin)
    },

    // GQL typed-schema DDL + HAVING (gql ast.rs:346 CreateNodeTypeStatement,
    // :47 HavingClause): register node/edge types, reject an INSERT missing
    // a NOT NULL property, accept a conforming one, then read back the type
    // catalog AND a HAVING-filtered aggregate in one result.
    QueryDef(
      "q_gql_types",
      """SELECT kind, name, property, nullable FROM (
        |  SELECT 'edge' AS kind, 'SHIPS_TO' AS name, 'eta' AS property, TRUE AS nullable
        |  UNION ALL SELECT 'node', 'Warehouse', 'capacity', TRUE
        |  UNION ALL SELECT 'node', 'Warehouse', 'wname', FALSE
        |  UNION ALL SELECT 'seg', s, NULL, NULL FROM (
        |    SELECT c_mktsegment AS s FROM customer
        |    GROUP BY c_mktsegment HAVING count(*) > 5
        |  )
        |)
        |ORDER BY kind NULLS FIRST, name NULLS FIRST, property NULLS FIRST""".stripMargin) { (s, dir) =>
      val sess = new graft.GraftSession(s, TpchGraph(s, dir))
      sess.gql("CREATE NODE TYPE Warehouse (wname STRING NOT NULL, capacity INT)")
      sess.gql("CREATE EDGE TYPE SHIPS_TO (eta INT)")
      val rejected =
        try { sess.gqlUpdate("INSERT (:Warehouse {id: 991234, capacity: 10})"); false }
        catch { case _: IllegalArgumentException => true }
      require(rejected, "INSERT missing a NOT NULL property must be rejected")
      sess.gqlUpdate("INSERT (:Warehouse {id: 991234, wname: 'w1', capacity: 10})")
      val types = sess.schemaTypes
        .select(col("kind"), col("name"), col("property"), col("nullable"))
      val segs = sess.gql(
        """MATCH (c:Customer)
          |RETURN 'seg' AS kind, c.category AS name, count(*) AS n
          |HAVING n > 5""".stripMargin)
        .select(col("kind"), col("name"), lit(null).cast("string").as("property"),
          lit(null).cast("boolean").as("nullable"))
      types.unionByName(segs).orderBy("kind", "name", "property")
    },

    // GraphQL mutations (graphql_translator.rs:130): create a hub, update
    // its name, detach-delete a customer segment, read everything back.
    QueryDef(
      "q_graphql_mutation",
      """SELECT name FROM (
        |  SELECT 'hub2' AS name
        |  UNION ALL
        |  SELECT c_name FROM customer WHERE c_mktsegment <> 'MACHINERY'
        |)
        |ORDER BY name NULLS FIRST""".stripMargin) { (s, dir) =>
      val sess = new graft.GraftSession(s, TpchGraph(s, dir))
      val g1 = sess.graphqlMutation(
        """mutation { createHub(id: 999, name: "gql_hub") { id } }""")
      val g2 = new graft.GraftSession(s, g1).graphqlMutation(
        """mutation { updateHub(id: 999, name: "hub2") { id } }""")
      val g3 = new graft.GraftSession(s, g2).graphqlMutation(
        """mutation { deleteCustomer(category: "MACHINERY") { id } }""")
      val after = new graft.GraftSession(s, g3)
      after.graphql("{ Hub { name } }")
        .unionByName(after.graphql("{ Customer { name } }"))
        .orderBy("name")
    },

    // Gremlin mutation steps (gremlin/ast.rs addV/addE/property/drop):
    // add a hub, link it to region 0, rename it, drop a customer segment,
    // read everything back through Gremlin traversals.
    QueryDef(
      "q_gremlin_mutation",
      """SELECT name FROM (
        |  SELECT 'hub3' AS name
        |  UNION ALL
        |  SELECT r_name FROM region WHERE r_regionkey = 0
        |  UNION ALL
        |  SELECT c_name FROM customer WHERE c_mktsegment <> 'MACHINERY'
        |)
        |ORDER BY name NULLS FIRST""".stripMargin) { (s, dir) =>
      val region0 = TpchGraph.RegionTag * TpchGraph.Stride
      val sess = new graft.GraftSession(s, TpchGraph(s, dir))
      val g1 = sess.gremlinUpdate(
        "g.addV('Hub').property('id', 999).property('name', 'ghub')")
      val g2 = new graft.GraftSession(s, g1).gremlinUpdate(
        s"g.addE('LINKS').from(V(999)).to(V($region0))")
      val g3 = new graft.GraftSession(s, g2).gremlinUpdate(
        "g.V().hasLabel('Hub').property('name', 'hub3')")
      val g4 = new graft.GraftSession(s, g3).gremlinUpdate(
        "g.V().hasLabel('Customer').has('category', 'MACHINERY').drop()")
      val after = new graft.GraftSession(s, g4)
      after.gremlin("g.V().hasLabel('Hub').out('LINKS').values('name')")
        .unionByName(after.gremlin("g.V().hasLabel('Hub').values('name')"))
        .unionByName(after.gremlin("g.V().hasLabel('Customer').values('name')"))
        .orderBy("name")
    },

    // SetProperty: +10% balance for BUILDING customers, others untouched.
    QueryDef(
      "q_mut_set_property",
      """SELECT c_custkey AS k,
        |       round(CASE WHEN c_mktsegment = 'BUILDING'
        |                  THEN c_acctbal * 1.1 ELSE c_acctbal END, 4) AS bal
        |FROM customer
        |ORDER BY k NULLS FIRST""".stripMargin) { (s, dir) =>
      val g = TpchGraph(s, dir)
      val g2 = Mutations.setNodeProperty(g,
        array_contains(col("labels"), "Customer") && col("category") === "BUILDING",
        "acctbal", col("acctbal") * 1.1)
      g2.nodesWithLabel("Customer")
        .select(TpchGraph.key(col("id")).as("k"), round(col("acctbal"), 4).as("bal"))
        .orderBy("k")
    },

    // REMOVE n.prop (reference cypher ast.rs:350 RemoveItem::Property,
    // database.rs:966 remove_node_property): BUILDING customers lose their
    // category — the typed column nulls out for exactly the matched rows,
    // driven through cypherUpdate so parse → bind → mutate is the path
    // under test. A MACHINERY control row proves others are untouched.
    QueryDef(
      "q_mut_remove_prop",
      """SELECT grp, n FROM (
        |  SELECT 'removed' AS grp,
        |         CAST((SELECT count(*) FROM customer WHERE c_mktsegment = 'BUILDING') AS BIGINT) AS n
        |  UNION ALL SELECT 'still_building', 0
        |  UNION ALL SELECT 'still_machinery',
        |            (SELECT count(*) FROM customer WHERE c_mktsegment = 'MACHINERY')
        |)
        |ORDER BY grp NULLS FIRST""".stripMargin) { (s, dir) =>
      val g2 = new graft.GraftSession(s, TpchGraph(s, dir)).cypherUpdate(
        "MATCH (c:Customer) WHERE c.category = 'BUILDING' REMOVE c.category")
      val cust = g2.nodesWithLabel("Customer")
      Seq(
        cust.filter(col("category").isNull)
          .select(lit("removed").as("grp")),
        cust.filter(col("category") === "BUILDING")
          .select(lit("still_building").as("grp")),
        cust.filter(col("category") === "MACHINERY")
          .select(lit("still_machinery").as("grp")))
        .reduce(_ unionByName _)
        .groupBy("grp").agg(count(lit(1)).as("n"))
        .unionByName(s.range(1).select(lit("still_building").as("grp"), lit(0L).as("n")))
        .groupBy("grp").agg(max(col("n")).as("n"))
        .orderBy("grp")
    },

    // SET n += {map} (merge), SET n = {map} (replace: other props null out)
    // and SET n:Label (ref cypher ast.rs SetItem AllProperties/
    // MergeProperties/Labels) — negative-balance customers are zeroed,
    // re-categorized and flagged; region 0 loses every property except name.
    QueryDef(
      "q_cypher_setmap",
      """SELECT k, nm, bal, cat, flg FROM (
        |  SELECT c_custkey AS k, c_name AS nm,
        |         round(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END, 4) AS bal,
        |         CASE WHEN c_acctbal < 0 THEN 'RESET' ELSE c_mktsegment END AS cat,
        |         (c_acctbal < 0) AS flg
        |  FROM customer
        |  UNION ALL
        |  SELECT r_regionkey, NULL, NULL, 'zeroed', NULL FROM region WHERE r_regionkey = 0
        |)
        |ORDER BY k NULLS FIRST, cat NULLS FIRST""".stripMargin) { (s, dir) =>
      val session = new graft.GraftSession(s, TpchGraph(s, dir))
      val g2 = session.cypherUpdate(
        """MATCH (c:Customer) WHERE c.acctbal < 0
          |SET c += {acctbal: 0.0, category: 'RESET'}, c:Reset""".stripMargin)
      val g3 = new graft.GraftSession(s, g2).cypherUpdate(
        "MATCH (r:Region) WHERE id(r) = 1000000000000 SET r = {category: 'zeroed'}")
      val g = g3
      // Single pass over the mutated node store: the two-label read-back as
      // one filter + conditional projection instead of two unioned
      // nodesWithLabel() scans — the mutated plan (flag joins + CASE
      // rewrites) is evaluated once, not twice. The Region row's nm/bal are
      // null BY the mutation (SET r = {map} nulled them), so the unified
      // projection needs no per-branch literals; flg stays null for Region
      // via the label-guarded CASE. Same rows, same oracle.
      val isCust = array_contains(col("labels"), "Customer")
      g.nodes
        .filter(isCust ||
          (array_contains(col("labels"), "Region") && TpchGraph.key(col("id")) === 0))
        .select(TpchGraph.key(col("id")).as("k"), col("name").as("nm"),
          round(col("acctbal"), 4).cast("double").as("bal"),
          col("category").as("cat"),
          when(isCust, array_contains(col("labels"), "Reset"))
            .otherwise(lit(null).cast("boolean")).as("flg"))
        .orderBy(col("k").asc_nulls_first, col("cat").asc_nulls_first)
    },

    // CreateNode + CreateEdge: one synthetic hub node linked to every region;
    // result = the new out-degree distribution of hub + regions.
    QueryDef(
      "q_mut_create",
      """SELECT k, outdeg FROM (
        |  SELECT CAST(999 AS BIGINT) AS k,
        |         (SELECT count(*) FROM region) AS outdeg
        |  UNION ALL
        |  SELECT CAST(r_regionkey AS BIGINT), CAST(0 AS BIGINT) FROM region
        |)
        |ORDER BY k NULLS FIRST""".stripMargin) { (s, dir) =>
      import s.implicits._
      val g = TpchGraph(s, dir)
      val hubId = 999L // plain id outside every tag stride
      val g2 = Mutations.createNodes(g,
        Seq((hubId, Seq("Hub"), "hub")).toDF("id", "labels", "name"))
      val g3 = Mutations.createEdges(g2,
        g.nodesWithLabel("Region").select(
          lit(hubId).as("src"), col("id").as("dst"), lit("LINKS").as("rel")))
      val regionIds = g3.nodesWithLabel("Region").select(col("id"))
        .unionByName(g3.nodesWithLabel("Hub").select(col("id")))
      // semi-filter the edge table on the handful of wanted sources BEFORE
      // aggregating: out-degree of 6 nodes must not shuffle-aggregate the
      // whole edge store (at 100 TB that is the difference between one
      // map-side filtered pass and a store-wide exchange)
      regionIds
        .join(g3.edges
            .join(broadcast(regionIds.withColumnRenamed("id", "src")),
              Seq("src"), "left_semi")
            .groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")),
          Seq("id"), "left_outer")
        .select(
          when(col("id") === hubId, lit(hubId))
            .otherwise(TpchGraph.key(col("id"))).as("k"),
          coalesce(col("deg"), lit(0L)).as("outdeg"))
        .orderBy("k")
    },

    // AddLabel/RemoveLabel: tag rich customers, untag BUILDING ones; count by
    // final label membership.
    QueryDef(
      "q_mut_labels",
      """SELECT count(*) AS n_rich
        |FROM customer
        |WHERE c_acctbal > 5000.0 AND c_mktsegment <> 'BUILDING'""".stripMargin) { (s, dir) =>
      val g = TpchGraph(s, dir)
      val tagged = Mutations.addLabel(g,
        array_contains(col("labels"), "Customer") && col("acctbal") > 5000.0, "Rich")
      val untagged = Mutations.removeLabel(tagged, col("category") === "BUILDING", "Rich")
      untagged.nodesWithLabel("Rich").agg(count(lit(1)).as("n_rich"))
    },

    // DETACH DELETE: drop all Order nodes; CONTAINS/PLACED_BY edges must go
    // with them, SUPPLIES/FROM_NATION/IN_REGION survive.
    QueryDef(
      "q_mut_detach_delete",
      """SELECT 'FROM_NATION' AS rel,
        |       (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier) AS n
        |UNION ALL
        |SELECT 'IN_REGION', (SELECT count(*) FROM nation)
        |UNION ALL
        |SELECT 'SUPPLIES',
        |       (SELECT count(*) FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem))
        |ORDER BY rel NULLS FIRST""".stripMargin) { (s, dir) =>
      val g = TpchGraph(s, dir)
      val g2 = Mutations.deleteNodes(g, array_contains(col("labels"), "Order"),
        detach = true)
      g2.edges.groupBy("rel").agg(count(lit(1)).as("n")).orderBy("rel")
    },

    // MERGE (match-or-create with ON MATCH / ON CREATE): merge a mixed batch
    // of existing + new region names.
    QueryDef(
      "q_mut_merge",
      """SELECT name, tag FROM (
        |  SELECT r_name AS name,
        |         CASE WHEN r_name IN ('ASIA', 'EUROPE') THEN 'matched' ELSE NULL END AS tag
        |  FROM region
        |  UNION ALL
        |  SELECT 'ATLANTIS', 'created'
        |)
        |ORDER BY name NULLS FIRST""".stripMargin) { (s, dir) =>
      import s.implicits._
      val g0 = TpchGraph(s, dir)
      val regions = g0.nodesWithLabel("Region")
      val incoming = Seq("ASIA", "EUROPE", "ATLANTIS").toDF("name")
        .withColumn("id", lit(998L))
        .withColumn("labels", array(lit("Region")))
      val merged = Mutations.mergeNodes(
        g0.copy(nodes = regions), incoming, keyCol = "name",
        onMatchSet = Map("category" -> lit("matched")),
        onCreateSet = Map("category" -> lit("created")))
      merged.nodes.select(col("name"), col("category").as("tag")).orderBy("name")
    },
  )
}
