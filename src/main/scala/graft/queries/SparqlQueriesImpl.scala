package graft.queries

import graft.frontends.sparql.SparqlFrontend
import graft.graph.TpchRdf

/** SPARQL front-end coverage: text → parser → pattern algebra → DataFrame,
  * against plain-SQL oracles over the base tables (the triple view TpchRdf
  * is itself a deterministic projection of those tables).
  */
object SparqlQueriesImpl {

  def defs: Seq[QueryDef] = Seq(

    // DESCRIBE ?v WHERE (ref sparql/ast.rs:59,233): every triple about each
    // BUILDING-segment customer.
    QueryDef(
      "q_sparql_describe",
      """WITH b AS (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT s, p, o FROM (
        |  SELECT 'c:' || c_custkey AS s, 'name' AS p, c_name AS o FROM b
        |  UNION ALL SELECT 'c:' || c_custkey, 'segment', c_mktsegment FROM b
        |  UNION ALL SELECT 'c:' || c_custkey, 'inNation', 'n:' || c_nationkey FROM b
        |)
        |ORDER BY s NULLS FIRST, p NULLS FIRST, o NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        "DESCRIBE ?c WHERE { ?c segment 'BUILDING' }")
        .orderBy("s", "p", "o")
    },

    // Nested SELECT subquery (ref sparql/ast.rs:321-322): per-nation member
    // counts aggregated in the subquery, names joined in the outer group.
    QueryDef(
      "q_sparql_subquery",
      """SELECT nn, cnt FROM (
        |  SELECT n_name AS nn, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT c_nationkey AS k FROM customer
        |        UNION ALL SELECT s_nationkey FROM supplier)
        |  JOIN nation ON k = n_nationkey
        |  GROUP BY n_name
        |)
        |ORDER BY nn NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        """SELECT ?nn ?cnt WHERE {
          |  ?n name ?nn .
          |  { SELECT ?n (COUNT(*) AS ?cnt) WHERE { ?m inNation ?n } GROUP BY ?n }
          |} ORDER BY ?nn""".stripMargin)
    },

    // Builtin battery over typed date literals (ref parser.rs:1555-1714):
    // STR strips the ^^xsd:date suffix, DATATYPE inspects it, YEAR/MONTH/DAY
    // read the lexical form, MD5/SHA256 hash it, REGEX filters it.
    QueryDef(
      "q_sparql_funcs",
      """SELECT 'o:' || o_orderkey AS o,
        |       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS lex,
        |       'xsd:date' AS dt,
        |       CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       CAST(day(o_orderdate) AS INT) AS dy,
        |       md5(CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS m5,
        |       sha256(CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS s256
        |FROM orders
        |WHERE month(o_orderdate) = 12 AND day(o_orderdate) = 25
        |ORDER BY o NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf.withDates(s, dir),
        """SELECT ?o ?lex ?dt ?yr ?mo ?dy ?m5 ?s256 WHERE {
          |  ?o odate ?d .
          |  BIND(STR(?d) AS ?lex)
          |  BIND(DATATYPE(?d) AS ?dt)
          |  BIND(YEAR(?d) AS ?yr) BIND(MONTH(?d) AS ?mo) BIND(DAY(?d) AS ?dy)
          |  BIND(MD5(?lex) AS ?m5) BIND(SHA256(?lex) AS ?s256)
          |  FILTER(REGEX(?lex, '-12-25$'))
          |} ORDER BY ?o""".stripMargin)
    },

    // BGP + FILTER (TripleScan plan.rs:480-503; FILTER planner_rdf.rs).
    QueryDef(
      "q_sparql_select",
      """SELECT 'c:' || c_custkey AS c, c_name AS cn
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7' AND c_name LIKE 'Customer#0000001%'
        |ORDER BY c NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        """SELECT ?c ?cn WHERE {
          |  ?c inNation ?nat .
          |  ?nat name 'NATION_7' .
          |  ?c name ?cn .
          |  FILTER(STRSTARTS(?cn, 'Customer#0000001'))
          |} ORDER BY ?c""".stripMargin)
    },

    // OPTIONAL → left outer join (plan.rs:513-521): nations with their
    // suppliers, null-extended where none exist.
    QueryDef(
      "q_sparql_optional",
      """SELECT n_name AS nn, s_name AS sn
        |FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
        |ORDER BY nn NULLS FIRST, sn NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        """SELECT ?nn ?sn WHERE {
          |  ?nat name ?nn .
          |  FILTER(STRSTARTS(?nat, 'n:'))
          |  OPTIONAL { ?s inNation ?nat . ?s name ?sn . FILTER(STRSTARTS(?s, 's:')) }
          |} ORDER BY ?nn ?sn""".stripMargin)
    },

    // UNION (plan.rs:506-510): nation names ∪ customer segments.
    QueryDef(
      "q_sparql_union",
      """SELECT x FROM (
        |  SELECT n_name AS x FROM nation
        |  UNION ALL
        |  SELECT c_mktsegment FROM customer
        |)
        |ORDER BY x NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        """SELECT ?x WHERE {
          |  { ?n name ?x . FILTER(STRSTARTS(?n, 'n:')) }
          |  UNION
          |  { ?c segment ?x }
          |} ORDER BY ?x""".stripMargin)
    },

    // MINUS → anti join (plan.rs:524-530): customers minus BUILDING ones.
    QueryDef(
      "q_sparql_minus",
      """SELECT 'c:' || c_custkey AS c
        |FROM customer WHERE c_mktsegment <> 'BUILDING'
        |ORDER BY c NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        """SELECT ?c WHERE {
          |  ?c inNation ?n .
          |  FILTER(STRSTARTS(?c, 'c:'))
          |  MINUS { ?c segment 'BUILDING' }
          |} ORDER BY ?c""".stripMargin)
    },

    // BIND + string builtins (plan.rs:533-541; §2.5 function surface).
    QueryDef(
      "q_sparql_bind",
      """SELECT n_name AS nn, upper(n_name) AS un, length(n_name) AS ln,
        |       substr(n_name, 1, 6) AS pre,
        |       concat(n_name, '!') AS bang
        |FROM nation
        |ORDER BY nn NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        """SELECT ?nn ?un ?ln ?pre ?bang WHERE {
          |  ?nat name ?nn .
          |  FILTER(STRSTARTS(?nat, 'n:'))
          |  BIND(UCASE(?nn) AS ?un)
          |  BIND(STRLEN(?nn) AS ?ln)
          |  BIND(SUBSTR(?nn, 1, 6) AS ?pre)
          |  BIND(CONCAT(?nn, '!') AS ?bang)
          |} ORDER BY ?nn""".stripMargin)
    },

    // Property path `+` — transitive closure over the part tree from a bound
    // subject (one BFS, not all-pairs), ref sparql/ast.rs:388-414.
    QueryDef(
      "q_sparql_path",
      """WITH RECURSIVE tree AS (
        |  SELECT a.p_partkey AS src, b.p_partkey AS dst
        |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey
        |  UNION ALL
        |  SELECT a.p_partkey, b.p_partkey
        |  FROM part a JOIN part b ON b.p_partkey = 2*a.p_partkey + 1
        |),
        |reach(dn) AS (
        |  SELECT dst FROM tree WHERE src = 3
        |  UNION
        |  SELECT t.dst FROM reach JOIN tree t ON t.src = reach.dn
        |)
        |SELECT 'pt:' || dn AS d FROM reach
        |ORDER BY d NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf.withPaths(s, dir),
        "SELECT ?d WHERE { pt:3 child+ ?d } ORDER BY ?d")
    },

    // Property path `/` sequence and `|` alternative in one pattern.
    QueryDef(
      "q_sparql_path_ops",
      """SELECT c, r, nm FROM (
        |  SELECT 'c:' || c_custkey AS c, 'r:' || n_regionkey AS r, c_name AS nm
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT 'c:' || c_custkey, 'r:' || n_regionkey, c_mktsegment
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |)
        |ORDER BY c NULLS FIRST, r NULLS FIRST, nm NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf.withPaths(s, dir),
        """SELECT ?c ?r ?nm WHERE {
          |  ?c inNation/inRegion ?r .
          |  ?c name|segment ?nm .
          |  FILTER(STRSTARTS(?c, 'c:'))
          |} ORDER BY ?c ?r ?nm""".stripMargin)
    },

    // FILTER EXISTS → semi join on the shared variable (SPARQL 1.1 §8.1).
    QueryDef(
      "q_sparql_exists",
      """SELECT n_name AS nn FROM nation
        |WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
        |ORDER BY nn NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        """SELECT ?nn WHERE {
          |  ?nat name ?nn .
          |  FILTER(STRSTARTS(?nat, 'n:'))
          |  FILTER EXISTS { ?s inNation ?nat . FILTER(STRSTARTS(?s, 's:')) }
          |} ORDER BY ?nn""".stripMargin)
    },

    // VALUES inline bindings (SPARQL 1.1 §10.2) → broadcast-joined literal
    // relation.
    QueryDef(
      "q_sparql_values",
      """SELECT 'c:' || c_custkey AS c, c_mktsegment AS seg
        |FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |ORDER BY c NULLS FIRST, seg NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        """SELECT ?c ?seg WHERE {
          |  ?c segment ?seg .
          |  VALUES ?seg { 'BUILDING' 'MACHINERY' }
          |} ORDER BY ?c ?seg""".stripMargin)
    },

    // GROUP_CONCAT + SAMPLE (SPARQL 1.1 §18.5.1) — both made deterministic
    // (sorted concat, minimum sample) so the oracle can reproduce them.
    QueryDef(
      "q_sparql_groupconcat",
      """SELECT c_mktsegment AS seg,
        |       string_agg(c_name, '|' ORDER BY c_name) AS names,
        |       min(c_name) AS pick
        |FROM customer
        |WHERE c_name LIKE '%1'
        |GROUP BY c_mktsegment
        |ORDER BY seg NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        """SELECT ?seg (GROUP_CONCAT(?nm, '|') AS ?names) (SAMPLE(?nm) AS ?pick)
          |WHERE {
          |  ?c segment ?seg .
          |  ?c name ?nm .
          |  FILTER(STRENDS(?nm, '1'))
          |} GROUP BY ?seg ORDER BY ?seg""".stripMargin)
    },

    // Aggregation + GROUP BY (SPARQL 1.1; RDF aggregate planning).
    QueryDef(
      "q_sparql_agg",
      """SELECT n_name AS nn, count(*) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY nn NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        """SELECT ?nn (COUNT(?c) AS ?cnt) WHERE {
          |  ?c inNation ?nat .
          |  ?nat name ?nn .
          |  FILTER(STRSTARTS(?c, 'c:'))
          |} GROUP BY ?nn ORDER BY ?nn""".stripMargin)
    },

    // `a` keyword = rdf:type (SPARQL 1.1 §4.2.4; ref sparql/ast.rs): class
    // membership scan joined with a property lookup.
    QueryDef(
      "q_sparql_a_type",
      """SELECT 's:' || s_suppkey AS s, s_name AS nm
        |FROM supplier
        |ORDER BY s NULLS FIRST, nm NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf.withTypes(s, dir),
        """SELECT ?s ?nm WHERE {
          |  ?s a Supplier .
          |  ?s name ?nm .
          |} ORDER BY ?s ?nm""".stripMargin)
    },

    // Negated property set !(p1|p2) (SPARQL 1.1 §9.1, ref
    // sparql/ast.rs:388-414): every edge that is neither name nor segment —
    // i.e. exactly the inNation triples.
    QueryDef(
      "q_sparql_nps",
      """SELECT s, o FROM (
        |  SELECT 'c:' || c_custkey AS s, 'n:' || c_nationkey AS o FROM customer
        |  UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
        |)
        |ORDER BY s NULLS FIRST, o NULLS FIRST""".stripMargin) { (s, dir) =>
      SparqlFrontend.run(TpchRdf(s, dir),
        """SELECT ?s ?o WHERE { ?s !(name|segment) ?o }
          |ORDER BY ?s ?o""".stripMargin)
    },
  )
}
