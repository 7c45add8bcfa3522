package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.graph.TpchGraph

/** Cross-language front-end coverage (Gremlin, GraphQL, GQL) — the
  * reference's pattern of running equivalent queries through every language
  * against one oracle (SURVEY §5.3).
  */
object LangQueriesImpl {

  private def session(s: org.apache.spark.sql.SparkSession, dir: String) =
    new GraftSession(s, TpchGraph(s, dir))

  def defs: Seq[QueryDef] = Seq(

    // Gremlin traversal: filter + expand + value projection (bag semantics —
    // one row per qualifying customer).
    QueryDef(
      "q_gremlin_traversal",
      """SELECT n_name AS name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 7000.0
        |ORDER BY name NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir).gremlin(
        "g.V().hasLabel('Customer').has('acctbal', gt(7000.0))" +
          ".out('FROM_NATION').values('name').order().by()")
    },

    // Gremlin groupCount.
    QueryDef(
      "q_gremlin_groupcount",
      """SELECT c_mktsegment AS category, count(*) AS count
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY category NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir)
        .gremlin("g.V().hasLabel('Customer').groupCount().by('category')")
        .orderBy("category")
    },

    // Gremlin dedup + order + range (skip/limit paging).
    QueryDef(
      "q_gremlin_range",
      """SELECT n_name AS name FROM nation
        |ORDER BY name NULLS FIRST
        |LIMIT 10 OFFSET 5""".stripMargin) { (s, dir) =>
      session(s, dir).gremlin(
        "g.V().hasLabel('Nation').values('name').dedup().order().by().range(5, 15)")
    },

    // Gremlin as/select with by() modulators.
    QueryDef(
      "q_gremlin_select",
      """SELECT c_name AS c, n_name AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir).gremlin(
        "g.V().hasLabel('Customer').has('category', 'BUILDING').as('c')" +
          ".out('FROM_NATION').as('n').select('c', 'n').by('name').by('name')")
        .orderBy("c")
    },

    // Gremlin path(): the traverser id sequence as an array column.
    QueryDef(
      "q_gremlin_path",
      """SELECT CAST(2000000000000 + n_nationkey AS VARCHAR) || ',' ||
        |       CAST(1000000000000 + n_regionkey AS VARCHAR) AS path
        |FROM nation
        |ORDER BY path NULLS FIRST""".stripMargin) { (s, dir) =>
      // array outputs crash the oracle hasher — serialize the path to a string
      session(s, dir)
        .gremlin("g.V().hasLabel('Nation').out('IN_REGION').path()")
        .select(array_join(col("path").cast("array<string>"), ",").as("path"))
        .orderBy("path")
    },

    // GraphQL: root label scan + arg filter + nested expand.
    QueryDef(
      "q_graphql_nested",
      """SELECT c_name AS name, n_name AS nation_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY name NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir).graphql(
        """{ Customer(category: "BUILDING") { name FROM_NATION { name } } }""")
        .withColumnRenamed("FROM_NATION_name", "nation_name")
        .orderBy("name")
    },

    // GQL entry point (shares the core grammar with Cypher).
    QueryDef(
      "q_gql_match",
      """SELECT s_name AS sup, n_name AS nat
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY sup NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir).gql(
        """MATCH (s:Supplier)-[:FROM_NATION]->(n:Nation)
          |RETURN s.name AS sup, n.name AS nat
          |ORDER BY sup""".stripMargin)
    },
  )
}
