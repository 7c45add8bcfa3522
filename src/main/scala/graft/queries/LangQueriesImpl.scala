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

    // Gremlin properties() step objects (ref gremlin/ast.rs:262): one
    // traverser per present property as a {key, value} struct; the absent
    // acctbal/category of Region nodes yield NO objects, and key()/value()
    // project out of the object (value() drives the oracle compare; the
    // struct fields are read directly for the two-column result).
    QueryDef(
      "q_gremlin_properties",
      """SELECT k, v FROM (
        |  SELECT 'name' AS k, r_name AS v FROM region
        |  UNION ALL
        |  SELECT 'name', n_name FROM nation
        |)
        |ORDER BY k NULLS FIRST, v NULLS FIRST""".stripMargin) { (s, dir) =>
      val sess = session(s, dir)
      sess.gremlin("g.V().hasLabel('Region').properties()")
        .unionByName(sess.gremlin("g.V().hasLabel('Nation').properties('name')"))
        .select(col("property.key").as("k"), col("property.value").as("v"))
        .orderBy("k", "v")
    },

    // Gremlin fold/unfold round trip (collect to a list, explode back —
    // multiset-preserving regardless of collect order).
    QueryDef(
      "q_gremlin_fold",
      """SELECT n_name AS name FROM nation
        |ORDER BY name NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir).gremlin(
        "g.V().hasLabel('Nation').values('name').fold().unfold().order().by()")
    },

    // Gremlin group().by(key).by(count()) — the general group step.
    QueryDef(
      "q_gremlin_group",
      """SELECT c_mktsegment AS category, count(*) AS "count"
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY category NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir)
        .gremlin("g.V().hasLabel('Customer').group().by('category').by(count())")
        .orderBy("category")
    },

    // Gremlin project().by() — named multi-column projection.
    QueryDef(
      "q_gremlin_project",
      """SELECT c_name AS nm, c_mktsegment AS seg
        |FROM customer WHERE c_acctbal > 9000.0
        |ORDER BY nm NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir).gremlin(
        "g.V().hasLabel('Customer').has('acctbal', gt(9000.0))" +
          ".project('nm', 'seg').by('name').by('category').order().by('nm')")
    },

    // Gremlin where(neq(alias)): same-region nation pairs excluding self.
    QueryDef(
      "q_gremlin_where",
      """SELECT count(*) AS c
        |FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
        |WHERE a.n_nationkey <> b.n_nationkey""".stripMargin) { (s, dir) =>
      session(s, dir).gremlin(
        "g.V().hasLabel('Nation').as('a').out('IN_REGION').in('IN_REGION')" +
          ".where(neq('a')).count()")
        .select(col("count").as("c"))
    },

    // Gremlin choose() with an anonymous-TRAVERSAL condition
    // (gremlin/ast.rs:19-187): nodes with an outgoing FROM_NATION edge take
    // the true branch — compiled as a correlated count, one distributed plan.
    QueryDef(
      "q_gremlin_choose_trav",
      """SELECT key, count FROM (
        |  SELECT 'linked' AS key, CAST((SELECT count(*) FROM customer) +
        |         (SELECT count(*) FROM supplier) AS BIGINT) AS count
        |  UNION ALL
        |  SELECT 'leaf', (SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
        |         + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders)
        |)
        |ORDER BY key NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir).gremlin(
        "g.V().choose(out('FROM_NATION'), constant('linked'), constant('leaf')).groupCount()")
        .orderBy("key")
    },

    // Gremlin coalesce(values, values): category where present, else name.
    QueryDef(
      "q_gremlin_coalesce",
      """SELECT v FROM (
        |  SELECT r_name AS v FROM region
        |  UNION ALL SELECT n_name FROM nation
        |  UNION ALL SELECT s_name FROM supplier
        |  UNION ALL SELECT c_mktsegment FROM customer
        |  UNION ALL SELECT p_brand FROM part
        |  UNION ALL SELECT CAST(o_orderstatus AS VARCHAR) FROM orders
        |)
        |ORDER BY v NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir).gremlin(
        "g.V().coalesce(values('category'), values('name')).order().by()")
    },

    // Gremlin E() edge scan: sum of CONTAINS edge weights (= l_quantity,
    // integer-valued doubles → exact sums in any engine).
    QueryDef(
      "q_gremlin_edges",
      "SELECT CAST(sum(l_quantity) AS DOUBLE) AS sum FROM lineitem") { (s, dir) =>
      session(s, dir).gremlin("g.E('CONTAINS').values('weight').sum()")
    },

    // Gremlin repeat().times(n) → exactly-n-hop var-length walk (bag
    // semantics: one row per walk).
    QueryDef(
      "q_gremlin_repeat",
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
        |walk(dst, hops) AS (
        |  SELECT dst, 1 FROM dag WHERE src = 1
        |  UNION ALL
        |  SELECT d.dst, w.hops + 1 FROM walk w JOIN dag d ON d.src = w.dst
        |  WHERE w.hops < 2
        |)
        |SELECT CAST(dst AS BIGINT) AS id FROM walk WHERE hops = 2
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      new GraftSession(s, TpchGraph.partDag(s, dir)).gremlin(
        "g.V().hasId(1).repeat(out('LINK')).times(2).id().order().by()")
    },

    // Gremlin bothV(): both endpoints of each IN_REGION edge (bag).
    QueryDef(
      "q_gremlin_bothv",
      """SELECT id FROM (
        |  SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS id FROM nation
        |  UNION ALL
        |  SELECT CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation
        |)
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir).gremlin("g.E('IN_REGION').bothV().id().order().by()")
    },

    // Gremlin optional(): nations move to their region, every other node
    // stays put — the mixed move/stay shape optional() exists for.
    QueryDef(
      "q_gremlin_optional",
      """SELECT nm FROM (
        |  SELECT r_name AS nm FROM nation JOIN region ON n_regionkey = r_regionkey
        |  UNION ALL SELECT r_name FROM region
        |  UNION ALL SELECT s_name FROM supplier
        |  UNION ALL SELECT c_name FROM customer
        |  UNION ALL SELECT p_name FROM part
        |  UNION ALL SELECT CAST(o_orderkey AS VARCHAR) FROM orders
        |)
        |ORDER BY nm NULLS FIRST""".stripMargin) { (s, dir) =>
      session(s, dir).gremlin(
        "g.V().optional(out('IN_REGION')).values('name').order().by()")
        .withColumnRenamed("name", "nm")
    },

    // Gremlin store/cap side-effect collection via sideEffect(): the stored
    // bag snapshots at the store step; cap() emits it sorted (deterministic
    // stand-in for TinkerPop's traversal order). Serialized to a string —
    // array outputs crash the oracle hasher.
    QueryDef(
      "q_gremlin_store",
      "SELECT string_agg(n_name, ',' ORDER BY n_name) AS x FROM nation") { (s, dir) =>
      session(s, dir)
        .gremlin("g.V().hasLabel('Nation').values('name').sideEffect(store('x')).cap('x')")
        .select(array_join(col("x"), ",").as("x"))
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
