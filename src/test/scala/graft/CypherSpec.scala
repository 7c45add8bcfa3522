package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.frontends.cypher.{Ast, CypherFrontend}
import graft.graph.{Out, PropertyGraph, TpchGraph}
import graft.ir.{Expr, Op}

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"
}

class CypherParserSpec extends AnyFunSuite {

  test("parses node pattern with label and props") {
    val q = CypherFrontend.parse("MATCH (c:Customer {category: 'BUILDING'}) RETURN c.name AS n")
    val m = q.clauses.head.asInstanceOf[Ast.MatchClause]
    assert(m.paths.head.head.v.contains("c"))
    assert(m.paths.head.head.label.contains("Customer"))
    assert(m.paths.head.head.props == Seq(("category", Expr.Lit("BUILDING"))))
  }

  test("parses relationship direction and var-length range") {
    val q = CypherFrontend.parse("MATCH (a)-[:LINK*2..4]->(b) RETURN id(a) AS x")
    val m = q.clauses.head.asInstanceOf[Ast.MatchClause]
    val (rel, _) = m.paths.head.tail.head
    assert(rel.relTypes == Seq("LINK"))
    assert(rel.range.contains((2, 4)))
    assert(rel.dir == Out)
  }

  test("parses operator precedence") {
    val q = CypherFrontend.parse("RETURN 1 + 2 * 3 AS x")
    val r = q.clauses.head.asInstanceOf[Ast.WithRet]
    assert(r.items.head._1 ==
      Expr.Bin("+", Expr.Lit(1L), Expr.Bin("*", Expr.Lit(2L), Expr.Lit(3L))))
  }

  test("parses WHERE with AND/OR/NOT, IN, STARTS WITH") {
    val q = CypherFrontend.parse(
      "MATCH (c) WHERE (c.a > 1 AND NOT c.b = 2) OR c.s STARTS WITH 'x' OR c.k IN [1,2] RETURN c.a AS a")
    assert(q.clauses.head.asInstanceOf[Ast.MatchClause].where.isDefined)
  }

  test("translate produces aggregate for RETURN with count") {
    val op = CypherFrontend.translate(
      CypherFrontend.parse("MATCH (c:Customer) RETURN c.category AS seg, count(*) AS n"))
    def hasAgg(t: Op.T): Boolean = t match {
      case Op.Aggregate(_, keys, aggs) => keys.nonEmpty && aggs.nonEmpty
      case Op.Project(in, _) => hasAgg(in)
      case _ => false
    }
    assert(hasAgg(op))
  }

  test("rejects malformed queries") {
    assertThrows[IllegalArgumentException](CypherFrontend.parse("MATCH (a RETURN a"))
    assertThrows[IllegalArgumentException](CypherFrontend.parse("RETURN"))
  }

  test("parses unbounded var-length forms") {
    def range(q: String) = CypherFrontend.parse(q).clauses.head
      .asInstanceOf[Ast.MatchClause].paths.head.tail.head._1.range
    assert(range("MATCH (a)-[*]->(b) RETURN a").contains((1, -1)))
    assert(range("MATCH (a)-[:T*2..]->(b) RETURN a").contains((2, -1)))
    assert(range("MATCH (a)-[:T*..5]->(b) RETURN a").contains((1, 5)))
    assert(range("MATCH (a)-[:T*3]->(b) RETURN a").contains((3, 3)))
  }

  test("pattern predicate parses to an exists subquery; parenthesized exprs survive") {
    val q = CypherFrontend.parse(
      "MATCH (a:Customer) WHERE (a)-[:FROM_NATION]->(:Nation) RETURN a.name AS n")
    val w = q.clauses.head.asInstanceOf[Ast.MatchClause].where.get
    assert(w.isInstanceOf[Expr.ExistsSub])
    // plain parenthesized arithmetic must still parse as an expression
    val q2 = CypherFrontend.parse("RETURN (1 + 2) * 3 AS x")
    assert(q2.clauses.head.asInstanceOf[Ast.WithRet].items.head._1 ==
      Expr.Bin("*", Expr.Bin("+", Expr.Lit(1L), Expr.Lit(2L)), Expr.Lit(3L)))
    // (a) alone is a parenthesized variable, not a pattern
    val q3 = CypherFrontend.parse("MATCH (a:Customer) WHERE (a.acctbal) > 1.0 RETURN a.name AS n")
    assert(q3.clauses.head.asInstanceOf[Ast.MatchClause].where.get ==
      Expr.Bin(">", Expr.Prop("a", "acctbal"), Expr.Lit(1.0)))
  }

  test("parses relationship type alternation [:A|B] and legacy [:A|:B]") {
    val q = CypherFrontend.parse("MATCH (a)-[r:KNOWS|WORKS_AT]->(b) RETURN id(a) AS x")
    val m = q.clauses.head.asInstanceOf[Ast.MatchClause]
    assert(m.paths.head.tail.head._1.relTypes == Seq("KNOWS", "WORKS_AT"))
    val q2 = CypherFrontend.parse("MATCH (a)-[:KNOWS|:WORKS_AT]->(b) RETURN id(a) AS x")
    val m2 = q2.clauses.head.asInstanceOf[Ast.MatchClause]
    assert(m2.paths.head.tail.head._1.relTypes == Seq("KNOWS", "WORKS_AT"))
  }
}

class CypherEndToEndSpec extends AnyFunSuite {
  import TestSpark._

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))

  test("simple match + filter + return") {
    val rows = session.cypher(
      "MATCH (c:Customer) WHERE c.acctbal > 9000.0 RETURN c.name AS n ORDER BY n")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
  }

  test("expand matches SQL join") {
    val got = session.cypher(
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)
        |RETURN n.name AS nat, count(*) AS cnt ORDER BY nat""".stripMargin).collect()
    val exp = spark.read.parquet(s"$sf/customer.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        org.apache.spark.sql.functions.col("c_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .groupBy("n_name").count().orderBy("n_name").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      exp.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("unwind with arithmetic") {
    val rows = session.cypher("UNWIND [1,2,3] AS x RETURN x * 10 AS y ORDER BY y").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L))
  }

  test("distinct + skip + limit") {
    val rows = session.cypher(
      "MATCH (c:Customer) RETURN DISTINCT c.category AS seg ORDER BY seg SKIP 1 LIMIT 2").collect()
    assert(rows.length == 2)
  }

  test("simple CASE desugars to searched form") {
    val rows = session.cypher(
      """MATCH (c:Customer)
        |RETURN CASE c.category WHEN 'BUILDING' THEN 'b' WHEN 'MACHINERY' THEN 'm'
        |       ELSE 'other' END AS tag, count(*) AS n ORDER BY tag""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = spark.read.parquet(s"$sf/customer.parquet")
      .groupBy("c_mktsegment").count().collect()
      .map(r => (r.getString(0) match {
        case "BUILDING" => "b"
        case "MACHINERY" => "m"
        case _ => "other"
      }) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(rows == exp)
  }

  test("RETURN * yields all bound variables") {
    val df = session.cypher(
      "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) RETURN * ORDER BY c, n LIMIT 3")
    assert(df.columns.toSet == Set("c", "n"))
    assert(df.collect().length == 3)
    val one = session.cypher("UNWIND [3, 1, 2] AS x RETURN * ORDER BY x").collect()
    assert(one.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("case expression") {
    val rows = session.cypher(
      """MATCH (c:Customer) RETURN c.name AS n,
        |CASE WHEN c.acctbal > 5000.0 THEN 'hi' ELSE 'lo' END AS band
        |ORDER BY n LIMIT 5""".stripMargin).collect()
    assert(rows.forall(r => Set("hi", "lo").contains(r.getString(1))))
  }
}

class GraphOpsSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  lazy val dag: PropertyGraph = TpchGraph.partDag(spark, sf)

  test("varLengthExpand bag semantics counts all walks") {
    val src = dag.nodes.filter(col("id") === 1).select(col("id").as("s"))
    val walks = dag.varLengthExpand(src, "s", Seq("LINK"), 1, 2).collect()
    // from 1: hop1 = {2 (tree), 3 (tree), 2 (chain)} → 2 appears twice
    val hop1 = walks.filter(_.getInt(2) == 1).map(_.getLong(1)).sorted
    assert(hop1.toSeq == Seq(2L, 2L, 3L))
  }

  test("bfs returns minimal distances") {
    val src = dag.nodes.filter(col("id") === 1).select(col("id").as("s"))
    val d = dag.bfs(src, "s", Seq("LINK"), maxDepth = 3).collect()
      .map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(d(2) == 1) // direct (both chain and tree edge)
    assert(d(3) == 1)
    assert(d(4) == 2) // 1→2→4
    assert(d(7) == 2) // 1→3→7
  }

  test("degrees sums in and out") {
    val g = TpchGraph(spark, sf)
    val deg = g.degrees.filter(col("id") === TpchGraph.RegionTag * TpchGraph.Stride)
      .collect().head
    assert(deg.getLong(1) == 0L) // region 0 has no out-edges
    assert(deg.getLong(2) > 0L)  // nations point at it
  }
}

class EdgeVarSpec extends AnyFunSuite {
  import TestSpark._

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))

  test("type(r) and edge property access") {
    val rows = session.cypher(
      """MATCH (s:Supplier)-[r:FROM_NATION]->(n:Nation)
        |RETURN s.name AS sup, type(r) AS t, r.weight AS w
        |ORDER BY sup LIMIT 3""".stripMargin).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1) == "FROM_NATION"))
    assert(rows.forall(_.getDouble(2) == 1.0))
  }
}

class ShortestPathCypherSpec extends AnyFunSuite {
  import TestSpark._

  lazy val dagSession = new GraftSession(spark, TpchGraph.partDag(spark, sf))

  // part DAG from node 1: edges k→2k, k→2k+1, k→k+1, so
  // dist(2)=dist(3)=1, dist(4)=dist(5)=dist(6)=dist(7)=2
  test("shortestPath binds minimal hop count via length(p)") {
    val d = dagSession.cypher(
      """MATCH p = shortestPath((a:Part {name: '1'})-[:LINK*1..3]->(b:Part))
        |RETURN id(b) AS dst, length(p) AS len ORDER BY dst""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d(2) == 1 && d(3) == 1)
    assert(d(4) == 2 && d(7) == 2)
  }

  test("allShortestPaths binds the same endpoint+length set") {
    val a = dagSession.cypher(
      """MATCH p = allShortestPaths((a:Part {name: '1'})-[:LINK*1..3]->(b:Part))
        |RETURN id(b) AS dst, length(p) AS len ORDER BY dst""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val s = dagSession.cypher(
      """MATCH p = shortestPath((a:Part {name: '1'})-[:LINK*1..3]->(b:Part))
        |RETURN id(b) AS dst, length(p) AS len ORDER BY dst""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(a == s && a.nonEmpty)
  }

  test("min-hops *2..3 drops nodes whose shortest distance is 1") {
    val d = dagSession.cypher(
      """MATCH p = shortestPath((a:Part {name: '1'})-[:LINK*2..3]->(b:Part))
        |RETURN id(b) AS dst, length(p) AS len ORDER BY dst""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(!d.contains(2) && !d.contains(3)) // 1-hop neighbors excluded
    assert(d(4) == 2 && d.values.forall(_ >= 2))
  }

  test("shortestPath without a var-length pattern is a clear error") {
    val e = intercept[IllegalArgumentException](dagSession.cypher(
      "MATCH p = shortestPath((a:Part)-[:LINK]->(b:Part)) RETURN id(b) AS d"))
    assert(e.getMessage.contains("var-length"))
  }

  test("min hops > 1 without a path variable is a clear error") {
    val e = intercept[IllegalArgumentException](dagSession.cypher(
      "MATCH shortestPath((a:Part {name: '1'})-[:LINK*2..3]->(b:Part)) RETURN id(b) AS d"))
    assert(e.getMessage.contains("path variable"))
  }
}

class CypherExprSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions.{col, countDistinct}

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))

  test("list comprehension filters and maps") {
    val r = session.cypher(
      "RETURN [x IN [1, 2, 3, 4, 5] WHERE x % 2 = 0 | x * 10] AS l").collect().head
    assert(r.getSeq[Long](0) == Seq(20L, 40L))
  }

  test("list comprehension without map / without filter") {
    val r = session.cypher(
      "RETURN [x IN [1, 2, 3] WHERE x > 1] AS a, [x IN [1, 2, 3] | x + 1] AS b")
      .collect().head
    assert(r.getSeq[Long](0) == Seq(2L, 3L))
    assert(r.getSeq[Long](1) == Seq(2L, 3L, 4L))
  }

  test("quantified predicates all/any/none/single") {
    val r = session.cypher(
      """RETURN all(x IN [2, 4, 6] WHERE x % 2 = 0) AS a,
        |       all(x IN [2, 3] WHERE x % 2 = 0) AS b,
        |       any(x IN [1, 2, 3] WHERE x > 2) AS c,
        |       any(x IN [1, 2] WHERE x > 2) AS d,
        |       none(x IN [1, 2] WHERE x > 2) AS e,
        |       single(x IN [1, 2, 3] WHERE x = 2) AS f,
        |       single(x IN [2, 2] WHERE x = 2) AS g""".stripMargin)
      .collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(2) && !r.getBoolean(3))
    assert(r.getBoolean(4))
    assert(r.getBoolean(5) && !r.getBoolean(6))
  }

  test("reduce folds with an explicit accumulator") {
    val r = session.cypher(
      """RETURN reduce(s = 0, x IN [1, 2, 3, 4] | s + x) AS sum4,
        |       reduce(p = 1, x IN [2, 3, 4] | p * x) AS prod,
        |       reduce(m = 100, x IN [7, 3, 9] | CASE WHEN x < m THEN x ELSE m END) AS mn""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 24L && r.getLong(2) == 3L)
  }

  test("quantifiers over property-derived lists") {
    val n = session.cypher(
      """MATCH (c:Customer) WHERE any(w IN split(c.name, '#') WHERE w = 'Customer')
        |RETURN count(*) AS n""".stripMargin).collect().head.getLong(0)
    val total = session.cypher(
      "MATCH (c:Customer) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n == total && total > 0) // every c_name starts with Customer#
  }

  test("index and slice access, 0-based with negatives") {
    val r = session.cypher(
      "RETURN [10, 20, 30][0] AS a, [10, 20, 30][-1] AS b, [10, 20, 30][1..3] AS c, [10, 20, 30][..2] AS d")
      .collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 30L)
    assert(r.getSeq[Long](2) == Seq(20L, 30L))
    assert(r.getSeq[Long](3) == Seq(10L, 20L))
  }

  test("map literal compiles to a struct") {
    val r = session.cypher("RETURN {a: 1, b: 'x'} AS m").collect().head
    val m = r.getStruct(0)
    assert(m.getLong(m.fieldIndex("a")) == 1L)
    assert(m.getString(m.fieldIndex("b")) == "x")
  }

  test("exists(n.prop) and hasLabel(n, label)") {
    val nRegions = session.cypher(
      "MATCH (n) WHERE hasLabel(n, 'Region') RETURN count(*) AS c")
      .collect().head.getLong(0)
    assert(nRegions == 5L)
    val noBal = session.cypher(
      "MATCH (r:Region) WHERE NOT exists(r.acctbal) RETURN count(*) AS c")
      .collect().head.getLong(0)
    assert(noBal == 5L)
  }

  test("EXISTS / NOT EXISTS subqueries partition the customers") {
    val withO = session.cypher(
      """MATCH (c:Customer) WHERE EXISTS { (c:Customer)<-[:PLACED_BY]-(:Order) }
        |RETURN count(*) AS c""".stripMargin).collect().head.getLong(0)
    val withoutO = session.cypher(
      """MATCH (c:Customer) WHERE NOT EXISTS { (c:Customer)<-[:PLACED_BY]-(:Order) }
        |RETURN count(*) AS c""".stripMargin).collect().head.getLong(0)
    val custs = spark.read.parquet(s"$sf/customer.parquet").count()
    val custsWithOrders = spark.read.parquet(s"$sf/orders.parquet")
      .agg(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    assert(withO == custsWithOrders)
    assert(withO + withoutO == custs)
  }

  test("COUNT { } subquery matches a group-by count") {
    val got = session.cypher(
      """MATCH (c:Customer) WHERE c.acctbal > 9000.0
        |RETURN c.name AS n, COUNT { (c:Customer)<-[:PLACED_BY]-(:Order) } AS cnt
        |ORDER BY n""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val exp = cust.filter(col("c_acctbal") > 9000.0)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_name").agg(org.apache.spark.sql.functions
        .count(col("o_orderkey")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp && got.nonEmpty)
  }

  test("COUNT { } in WHERE filters on the correlated count") {
    val got = session.cypher(
      """MATCH (c:Customer) WHERE COUNT { (c:Customer)<-[:PLACED_BY]-(:Order) } > 15
        |RETURN count(*) AS c""".stripMargin).collect().head.getLong(0)
    val exp = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey").count().filter(col("count") > 15).count()
    assert(got == exp)
  }
}

class CypherVectorFnSpec extends AnyFunSuite {
  import TestSpark._

  test("distance functions work in Cypher expressions") {
    val s = new GraftSession(spark, TpchGraph(spark, sf))
    val r = s.cypher(
      """UNWIND [1] AS x
        |RETURN round(cosine_similarity(vector([1.0, 0.0]), vector([1.0, 0.0])), 6) AS cs,
        |       round(euclidean_distance(vector([0.0, 0.0]), vector([3.0, 4.0])), 6) AS ed,
        |       round(dot_product(vector([1.0, 2.0]), vector([3.0, 4.0])), 6) AS dp,
        |       round(manhattan_distance(vector([1.0, 1.0]), vector([4.0, 5.0])), 6) AS md""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 11.0)
    assert(r.getDouble(3) == 7.0)
  }
}

class CyclicPatternSpec extends AnyFunSuite {
  import TestSpark._

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))
  lazy val dagSession = new GraftSession(spark, TpchGraph.partDag(spark, sf))

  test("re-bound node var closes the cycle instead of throwing") {
    // (o)-[:CONTAINS]->(p)<-[:CONTAINS]-(o) — 2-cycle via the same edge type
    // is satisfiable exactly when an order contains the part (any walk back)
    val got = session.cypher(
      """MATCH (o:Order)-[:CONTAINS]->(p:Part)<-[:CONTAINS]-(o)
        |RETURN count(*) AS c""".stripMargin).collect().head.getLong(0)
    // oracle: pairs of lineitems of the same order & part (incl. self-pairs)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val exp = li.groupBy("l_orderkey", "l_partkey")
      .count().selectExpr("sum(count * count)").collect().head.getLong(0)
    assert(got == exp && got > 0)
  }

  test("cycle on an acyclic graph matches nothing") {
    val c = dagSession.cypher(
      "MATCH (a:Part)-[:LINK]->(b:Part)-[:LINK]->(a) RETURN count(*) AS c")
      .collect().head.getLong(0)
    assert(c == 0L)
  }
}

class ParamBindingSpec extends AnyFunSuite {
  import TestSpark._

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))

  test("bound parameters behave as inlined literals") {
    val got = session.cypher(
      "MATCH (c:Customer) WHERE c.acctbal > $min RETURN c.name AS n ORDER BY n",
      Map("min" -> 9000.0)).collect().map(_.getString(0)).toSeq
    val exp = session.cypher(
      "MATCH (c:Customer) WHERE c.acctbal > 9000.0 RETURN c.name AS n ORDER BY n")
      .collect().map(_.getString(0)).toSeq
    assert(got == exp && got.nonEmpty)
  }

  test("string and list parameters bind") {
    val rows = session.cypher(
      "MATCH (c:Customer) WHERE c.category = $seg AND c.acctbal > $lo RETURN c.name AS n ORDER BY n LIMIT 3",
      Map("seg" -> "BUILDING", "lo" -> 0.0)).collect()
    assert(rows.length == 3)
  }

  test("missing parameter is a clear error") {
    val e = intercept[IllegalArgumentException](session.cypher(
      "MATCH (c:Customer) WHERE c.acctbal > $min RETURN c.name AS n",
      Map.empty[String, Any]))
    assert(e.getMessage.contains("missing parameter"))
  }

  test("unbound parameter without params map is a clear error") {
    val e = intercept[IllegalArgumentException](session.cypher(
      "MATCH (c:Customer) WHERE c.acctbal > $min RETURN c.name AS n").collect())
    assert(e.getMessage.contains("parameter"))
  }
}

class EdgeVarGuardSpec extends AnyFunSuite {
  import TestSpark._

  lazy val session = new GraftSession(spark, TpchGraph(spark, sf))

  test("reused relationship variable joins on edge identity") {
    // re-binding r in a second MATCH joins the two patterns on the SAME edge
    // (openCypher edge identity): the second pattern adds no multiplicity,
    // so the count equals the single-pattern count
    val single = session.cypher(
      """MATCH (a:Order)-[r:CONTAINS]->(b:Part)
        |RETURN count(*) AS n""".stripMargin).collect().head.getLong(0)
    val rebound = session.cypher(
      """MATCH (a:Order)-[r:CONTAINS]->(b:Part)
        |MATCH (c:Order)-[r:CONTAINS]->(d:Part)
        |RETURN count(*) AS n""".stripMargin).collect().head.getLong(0)
    assert(single > 0 && rebound == single)
    // ...and the joined endpoints agree with the original binding
    val mismatched = session.cypher(
      """MATCH (a:Order)-[r:CONTAINS]->(b:Part)
        |MATCH (c:Order)-[r:CONTAINS]->(d:Part)
        |WHERE id(c) <> id(a)
        |RETURN count(*) AS n""".stripMargin).collect().head.getLong(0)
    assert(mismatched == 0L)
  }

  test("a name used as both node and relationship variable is rejected") {
    assertThrows[IllegalArgumentException](session.cypher(
      """MATCH (r:Region)-[r:IN_REGION]->(b) RETURN count(*) AS n"""))
    // across clauses too: a node binding cannot re-bind as a relationship
    // (it has no edge identity to join on) — and vice versa
    assertThrows[IllegalArgumentException](session.cypher(
      """MATCH (r:Region)
        |MATCH (a:Nation)-[r:IN_REGION]->(b) RETURN count(*) AS n""".stripMargin))
    assertThrows[IllegalArgumentException](session.cypher(
      """MATCH (a:Nation)-[r:IN_REGION]->(b)
        |MATCH (r:Region) RETURN count(*) AS n""".stripMargin))
  }

  test("an edge-var name in one query does not poison the next (session scope)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col, lit, map}
    // nodes carry a dynamic props map, edges do not: if query 1's edge var
    // `x` leaked into query 2's compile, x.extra would wrongly resolve
    // against the EDGE table and miss the node props fallback
    val nodes = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .select(col("id"), array(lit("N")).as("labels"), col("name"),
        map(lit("extra"), lit("v1")).as("props"))
    val edges = Seq((1L, 2L)).toDF("src", "dst")
      .select(col("src"), col("dst"), lit("E").as("rel"))
    val s2 = new GraftSession(spark, graft.graph.PropertyGraph(nodes, edges))
    val t = s2.cypher("MATCH (a:N)-[x:E]->(b:N) RETURN type(x) AS t")
      .collect().head.getString(0)
    assert(t == "E")
    val extra = s2.cypher("MATCH (x:N {name: 'a'}) RETURN x.extra AS e")
      .collect().head.getString(0)
    assert(extra == "v1")
  }

  test("edge variable on var-length pattern is rejected with a clear error") {
    val e = intercept[IllegalArgumentException](session.cypher(
      "MATCH (a:Part)-[r:LINK*1..2]->(b:Part) RETURN type(r) AS t LIMIT 1"))
    assert(e.getMessage.contains("var-length"))
  }

  test("type() without arguments is a clear error") {
    val e = intercept[IllegalArgumentException](
      session.cypher("MATCH (a:Region) RETURN type() AS t"))
    assert(e.getMessage.contains("type()"))
  }

  test("pattern comprehension collects correlated matches, [] when none") {
    // region nodes have no outgoing edges: comprehension binds []
    val rows = session.cypher(
      """MATCH (r:Region)
        |RETURN r.name AS nm, toInteger(size([(r)-[:IN_REGION]->(x) | x.name])) AS n
        |ORDER BY nm""".stripMargin).collect()
    assert(rows.length == 5 && rows.forall(_.getLong(1) == 0L))
    // nations collect their region's name
    val nat = session.cypher(
      """MATCH (n:Nation)
        |RETURN n.name AS nm, [(n)-[:IN_REGION]->(r:Region) | r.name] AS regions
        |ORDER BY nm LIMIT 1""".stripMargin).collect().head
    // every nation is in exactly one region
    assert(nat.getSeq[String](1).size == 1 && nat.getSeq[String](1).head.nonEmpty)
  }

  test("bracket disambiguation: parenthesized exprs and list comps still parse") {
    val r = session.cypher(
      "UNWIND [(1+2), 3] AS x RETURN x ORDER BY x").collect().map(_.getLong(0)).toSeq
    assert(r == Seq(3L, 3L))
    val lc = session.cypher(
      "RETURN [x IN [1,2,3] WHERE x > 1 | x * 10] AS l").collect().head.getSeq[Long](0)
    assert(lc == Seq(20L, 30L))
  }

  test("SET parse forms: map set in ON CREATE is rejected clearly") {
    val e = intercept[IllegalArgumentException](
      graft.frontends.cypher.CypherFrontend.parse(
        "MERGE (n:X {id: 1}) ON CREATE SET n += {a: 1}"))
    assert(e.getMessage.contains("ON CREATE"))
  }

  test("UNION dedups, UNION ALL keeps the bag, mixing is rejected") {
    val base = "MATCH (r:Region) RETURN r.name AS nm"
    val all = session.cypher(s"$base UNION ALL $base").collect()
    val set = session.cypher(s"$base UNION $base").collect()
    val n = spark.read.parquet(s"$sf/region.parquet").count()
    assert(all.length == 2 * n && set.length == n)
    val e = intercept[IllegalArgumentException](session.cypher(
      s"$base UNION ALL $base UNION $base"))
    assert(e.getMessage.contains("mix"))
  }

  test("pattern predicates filter as semi/anti joins end-to-end") {
    // customers with at least one order, excluding one nation — equals the
    // explicit EXISTS { } form
    val sugar = session.cypher(
      """MATCH (c:Customer)
        |WHERE (c)<-[:PLACED_BY]-(:Order)
        |  AND NOT (c)-[:FROM_NATION]->(:Nation {name: 'NATION_3'})
        |RETURN c.name AS nm ORDER BY nm""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    val explicit = session.cypher(
      """MATCH (c:Customer)
        |WHERE exists { (c)<-[:PLACED_BY]-(:Order) }
        |  AND NOT exists { (c)-[:FROM_NATION]->(:Nation {name: 'NATION_3'}) }
        |RETURN c.name AS nm ORDER BY nm""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(sugar == explicit && sugar.nonEmpty)
  }

  test("rel-type alternation expands over the union of edge types") {
    val orders = spark.read.parquet(s"$sf/orders.parquet").count()
    val lines = spark.read.parquet(s"$sf/lineitem.parquet").count()
    val n = session.cypher(
      "MATCH (o:Order)-[r:PLACED_BY|CONTAINS]->(t) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(n == orders + lines)
    // per-type counts survive through type(r)
    val byType = session.cypher(
      """MATCH (o:Order)-[r:PLACED_BY|CONTAINS]->(t)
        |RETURN type(r) AS rt, count(*) AS n ORDER BY rt""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("CONTAINS" -> lines, "PLACED_BY" -> orders))
  }
}

/** Unbounded var-length expansion ([*], [*n..]) and full path binding
  * (nodes(p)/relationships(p)) — the reference's VariableLengthExpand with
  * max_hops: Option (plan.rs:195) and visited-set termination
  * (variable_length_expand.rs:263).
  */
class UnboundedVarLenSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  // 4-node directed cycle 1→2→3→4→1 plus a tail 4→5: unbounded expansion
  // must terminate (visited-set guard) and enumerate simple paths only.
  lazy val cyclic: PropertyGraph = {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
      .toDF("id")
      .select(col("id"), array(lit("N")).as("labels"),
        col("id").cast("string").as("name"),
        lit(null).cast("double").as("acctbal"),
        lit(null).cast("string").as("category"))
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 5L))
      .toDF("src", "dst")
      .select(col("src"), col("dst"), lit("E").as("rel"), lit(1.0).as("weight"))
    PropertyGraph(nodes, edges)
  }
  lazy val session = new GraftSession(spark, cyclic)

  test("[*] terminates on a cyclic graph with edge-unique walk semantics") {
    val rows = session.cypher(
      """MATCH (a:N {name: '1'})-[:E*]->(b:N)
        |RETURN id(b) AS dst, count(*) AS n ORDER BY dst""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // openCypher relationship-uniqueness: edges are unique per walk, nodes
    // may repeat — so the cycle edge 4→1 IS taken (walk 1→2→3→4→1), and the
    // walk stops there because edge 1→2 is already used
    assert(rows == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // node-unique simple paths remain available via the conf escape hatch
    spark.conf.set("spark.graft.varlen.uniqueness", "nodes")
    try {
      val simple = new GraftSession(spark, cyclic).cypher(
        """MATCH (a:N {name: '1'})-[:E*]->(b:N)
          |RETURN id(b) AS dst, count(*) AS n ORDER BY dst""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(simple == Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    } finally spark.conf.unset("spark.graft.varlen.uniqueness")
  }

  test("[*2..] applies the lower bound to unbounded walks") {
    val rows = session.cypher(
      """MATCH (a:N {name: '1'})-[:E*2..]->(b:N)
        |RETURN id(b) AS dst ORDER BY dst""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 3L, 4L, 5L)) // 1 via the full cycle 1→2→3→4→1
  }

  test("nodes(p) carries the walk and relationships(p) derives its edges") {
    val r = session.cypher(
      """MATCH p = (a:N {name: '1'})-[:E*]->(b:N {name: '5'})
        |RETURN nodes(p) AS path, length(p) AS len,
        |       size(relationships(p)) AS nrels""".stripMargin)
      .collect()
    assert(r.length == 1)
    assert(r.head.getSeq[Long](0) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(r.head.getInt(1) == 4 && r.head.getInt(2) == 4)
  }

  test("relationships(p) yields consecutive (src, dst) structs") {
    val r = session.cypher(
      """MATCH p = (a:N {name: '3'})-[:E*]->(b:N {name: '2'})
        |RETURN relationships(p) AS rels""".stripMargin)
      .collect()
    assert(r.length == 1)
    val rels = r.head.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(rels == Seq((3L, 4L), (4L, 1L), (1L, 2L)))
  }

  test("shortestPath binds nodes(p) to one minimal path") {
    val r = session.cypher(
      """MATCH p = shortestPath((a:N {name: '1'})-[:E*]->(b:N {name: '5'}))
        |RETURN nodes(p) AS path, length(p) AS len""".stripMargin).collect()
    assert(r.length == 1)
    assert(r.head.getSeq[Long](0) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(r.head.getInt(1) == 4)
  }

  test("allShortestPaths enumerates every minimal path") {
    import spark.implicits._
    // diamond: two 2-hop routes 1→2→4 and 1→3→4
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
      .select(col("id"), array(lit("N")).as("labels"),
        col("id").cast("string").as("name"),
        lit(null).cast("double").as("acctbal"),
        lit(null).cast("string").as("category"))
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
      .select(col("src"), col("dst"), lit("E").as("rel"), lit(1.0).as("weight"))
    val s = new GraftSession(spark, PropertyGraph(nodes, edges))
    val all = s.cypher(
      """MATCH p = allShortestPaths((a:N {name: '1'})-[:E*]->(b:N {name: '4'}))
        |RETURN nodes(p) AS path ORDER BY path""".stripMargin)
      .collect().map(_.getSeq[Long](0))
    assert(all.toSeq == Seq(Seq(1L, 2L, 4L), Seq(1L, 3L, 4L)))
    val one = s.cypher(
      """MATCH p = shortestPath((a:N {name: '1'})-[:E*]->(b:N {name: '4'}))
        |RETURN nodes(p) AS path""".stripMargin)
      .collect().map(_.getSeq[Long](0))
    assert(one.toSeq == Seq(Seq(1L, 2L, 4L))) // lexicographically smallest
  }

  test("[*0..n] includes the zero-length walk") {
    val rows = session.cypher(
      """MATCH (a:N {name: '1'})-[:E*0..2]->(b:N)
        |RETURN id(b) AS dst, count(*) AS n ORDER BY dst""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0 hops: 1 itself; 1 hop: 2; 2 hops: 3
    assert(rows == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("[*0..0] is the legal zero-length-only walk") {
    val rows = session.cypher(
      """MATCH (a:N {name: '1'})-[:E*0..0]->(b:N)
        |RETURN id(a) AS src, id(b) AS dst""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 1L))) // each source node, bound to itself
  }

  test("safety cap bounds unbounded expansion depth") {
    val capped = new GraftSession(
      { spark.conf.set("spark.graft.varlen.maxHops", "2"); spark }, cyclic)
    try {
      val rows = capped.cypher(
        """MATCH (a:N {name: '1'})-[:E*]->(b:N)
          |RETURN id(b) AS dst ORDER BY dst""".stripMargin)
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(2L, 3L))
    } finally spark.conf.unset("spark.graft.varlen.maxHops")
  }
}
