package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.frontends.sparql.SparqlFrontend
import graft.graph.{PropertyGraph, TripleGraph}

/** Differential SEMANTIC fuzz (r17 verdict #4): the parser fuzz
  * (ParserFuzzSpec) round-trips syntax only; the r16 lexer bugs lived in
  * the gap between "parses" and "means the right thing". Here a seeded
  * generator builds small random Cypher / SPARQL queries over a tiny fixed
  * graph, runs them through the REAL front-end + compiler stack, and
  * compares the collected multiset of rows against an expected result the
  * GENERATOR constructs directly with plain DataFrame algebra — sharing no
  * code with the front-ends, so a meaning bug in either lexer, parser, IR
  * translation, or compiler shows up as a row diff tagged with the exact
  * query text (reference analog: the cross-language equivalence suite,
  * tests/python/bases/test_queries.py:12).
  *
  * Values are Longs and Strings only, so string-rendered row comparison is
  * exact; rows are sorted in the HARNESS (no ORDER BY in generated
  * queries), so null-ordering conventions cannot mask a diff.
  */
class SemanticsFuzzSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val Seed = 181181L
  private val CasesPerKind = 30

  // ---------- fixture ----------
  // 40 nodes: even ids :A, odd :B; typed props x (0..6), y (0..4), s (s0..s2)
  // edges: one R and one S out of every node, w in 0..5; two S self-loops
  private lazy val g: PropertyGraph = {
    val nodes = (0L until 40L).map { i =>
      (i, if (i % 2 == 0) Seq("A") else Seq("B"), i % 7, i % 5, "s" + (i % 3))
    }.toDF("id", "labels", "x", "y", "s")
    val edges = (0L until 40L).flatMap { i =>
      Seq((i, (3 * i + 1) % 40, "R", i % 4), (i, (7 * i + 2) % 40, "S", i % 6))
    }.toDF("src", "dst", "rel", "w")
    PropertyGraph(nodes.cache(), edges.cache())
  }
  private lazy val session = new GraftSession(spark, g)

  // triples: every subject has a tag and a link; only even ones a color
  private lazy val triples: DataFrame = (0 until 30).flatMap { i =>
    Seq(("n" + i, "tag", "t" + (i % 4)), ("n" + i, "link", "n" + ((i * 7 + 3) % 30))) ++
      (if (i % 2 == 0) Seq(("n" + i, "color", "c" + (i % 3))) else Nil)
  }.toDF("s", "p", "o").cache()
  private lazy val rdf = TripleGraph(triples)

  // ---------- harness ----------
  private def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq
      .map(_.toSeq.map(v => if (v == null) "␀" else v.toString).mkString("|"))
      .sorted

  private def check(tag: String, query: String, got: => DataFrame,
      expected: DataFrame): Unit = {
    val gc = canon(got)
    val ec = canon(expected)
    assert(gc == ec,
      s"\n[$tag] semantic divergence for:\n  $query\n" +
        s"got      (${gc.size} rows): ${gc.take(8).mkString(" ; ")}\n" +
        s"expected (${ec.size} rows): ${ec.take(8).mkString(" ; ")}")
  }

  // ---------- Cypher predicate generator ----------
  // a predicate over one node variable rendered BOTH as Cypher text and as
  // a Column against the prefixed expected-side frame
  private final case class Pred(cy: String, col: Column)

  private def genPred(rnd: scala.util.Random, v: String,
      c: String => Column, depth: Int = 0): Pred = {
    def atom(): Pred = rnd.nextInt(8) match {
      case 0 => val k = rnd.nextInt(7); Pred(s"$v.x < $k", c("x") < k)
      case 1 => val k = rnd.nextInt(7); Pred(s"$v.x <= $k", c("x") <= k)
      case 2 => val k = rnd.nextInt(7); Pred(s"$v.x > $k", c("x") > k)
      case 3 => val k = rnd.nextInt(7); Pred(s"$v.x >= $k", c("x") >= k)
      case 4 => val k = rnd.nextInt(7); Pred(s"$v.x = $k", c("x") === k)
      case 5 => val k = rnd.nextInt(7); Pred(s"$v.x <> $k", c("x") =!= k)
      case 6 => val k = rnd.nextInt(5); Pred(s"$v.y = $k", c("y") === k)
      case _ => val k = "s" + rnd.nextInt(3); Pred(s"$v.s = '$k'", c("s") === k)
    }
    if (depth >= 1) atom()
    else rnd.nextInt(4) match {
      case 0 => atom()
      case 1 =>
        val (l, r) = (genPred(rnd, v, c, 1), genPred(rnd, v, c, 1))
        Pred(s"(${l.cy} AND ${r.cy})", l.col && r.col)
      case 2 =>
        val (l, r) = (genPred(rnd, v, c, 1), genPred(rnd, v, c, 1))
        Pred(s"(${l.cy} OR ${r.cy})", l.col || r.col)
      case _ =>
        val i = genPred(rnd, v, c, 1)
        Pred(s"(NOT ${i.cy})", !i.col)
    }
  }

  private def labelOf(rnd: scala.util.Random): String =
    if (rnd.nextBoolean()) "A" else "B"
  private def nodesWith(l: String, prefix: String): DataFrame =
    g.nodes.filter(array_contains(col("labels"), l))
      .select(col("id").as(s"${prefix}_id"), col("x").as(s"${prefix}_x"),
        col("y").as(s"${prefix}_y"), col("s").as(s"${prefix}_s"))

  test("cypher: filtered node scans mean what they say") {
    val rnd = new scala.util.Random(Seed)
    for (i <- 1 to CasesPerKind) {
      val l = labelOf(rnd)
      val p = genPred(rnd, "a", k => col(s"a_$k"))
      val q = s"MATCH (a:$l) WHERE ${p.cy} RETURN a.x AS x, a.y AS y, a.s AS s"
      val expected = nodesWith(l, "a").filter(p.col)
        .select(col("a_x").as("x"), col("a_y").as("y"), col("a_s").as("s"))
      check(s"scan#$i", q, session.cypher(q), expected)
    }
  }

  test("cypher: one-hop patterns join the right rows with the right multiplicity") {
    val rnd = new scala.util.Random(Seed + 1)
    for (i <- 1 to CasesPerKind) {
      val (la, lb) = (labelOf(rnd), labelOf(rnd))
      val t = if (rnd.nextBoolean()) "R" else "S"
      val pa = genPred(rnd, "a", k => col(s"a_$k"), 1)
      val pb = genPred(rnd, "b", k => col(s"b_$k"), 1)
      val q = s"MATCH (a:$la)-[r:$t]->(b:$lb) WHERE ${pa.cy} AND ${pb.cy} " +
        "RETURN a.x AS ax, b.x AS bx, r.w AS w"
      val expected = g.edges.filter(col("rel") === t)
        .join(nodesWith(la, "a"), col("src") === col("a_id"))
        .join(nodesWith(lb, "b"), col("dst") === col("b_id"))
        .filter(pa.col && pb.col)
        .select(col("a_x").as("ax"), col("b_x").as("bx"), col("w"))
      check(s"hop#$i", q, session.cypher(q), expected)
    }
  }

  test("cypher: grouped aggregates match direct groupBy") {
    val rnd = new scala.util.Random(Seed + 2)
    for (i <- 1 to CasesPerKind) {
      val l = labelOf(rnd)
      val withWhere = rnd.nextBoolean()
      val p = genPred(rnd, "a", k => col(s"a_$k"), 1)
      val wh = if (withWhere) s"WHERE ${p.cy} " else ""
      val q = s"MATCH (a:$l) ${wh}RETURN a.s AS grp, count(*) AS n, " +
        "sum(a.x) AS t, min(a.y) AS mn, max(a.x) AS mx"
      val base0 = nodesWith(l, "a")
      val base = if (withWhere) base0.filter(p.col) else base0
      val expected = base.groupBy(col("a_s").as("grp"))
        .agg(count(lit(1)).as("n"), sum("a_x").as("t"),
          min("a_y").as("mn"), max("a_x").as("mx"))
      check(s"agg#$i", q, session.cypher(q), expected)
    }
  }

  test("cypher: OPTIONAL MATCH and DISTINCT keep left rows and multiplicities") {
    val rnd = new scala.util.Random(Seed + 3)
    for (i <- 1 to CasesPerKind) {
      val la = labelOf(rnd)
      val lb = labelOf(rnd)
      val t = if (rnd.nextBoolean()) "R" else "S"
      val distinct = rnd.nextBoolean()
      val d = if (distinct) "DISTINCT " else ""
      val q = s"MATCH (a:$la) OPTIONAL MATCH (a)-[:$t]->(b:$lb) " +
        s"RETURN ${d}a.x AS ax, b.y AS by2"
      val right = g.edges.filter(col("rel") === t)
        .join(nodesWith(lb, "b"), col("dst") === col("b_id"))
        .select(col("src"), col("b_y"))
      val joined = nodesWith(la, "a")
        .join(right, col("a_id") === col("src"), "left")
        .select(col("a_x").as("ax"), col("b_y").as("by2"))
      val expected = if (distinct) joined.distinct() else joined
      check(s"opt#$i", q, session.cypher(q), expected)
    }
  }

  // ---------- SPARQL ----------
  private def tri(p: String): DataFrame = triples.filter(col("p") === p)

  test("sparql: two-pattern BGPs with FILTER mean the natural join") {
    val rnd = new scala.util.Random(Seed + 4)
    for (i <- 1 to 25) {
      val neq = rnd.nextBoolean()
      val tv = "t" + rnd.nextInt(4)
      val op = if (neq) "!=" else "="
      val q = s"SELECT ?a ?t ?c WHERE { ?a tag ?t . ?a color ?c . FILTER(?t $op '$tv') }"
      val pred = if (neq) col("t") =!= tv else col("t") === tv
      val expected = tri("tag").select(col("s").as("a"), col("o").as("t"))
        .join(tri("color").select(col("s").as("a"), col("o").as("c")), Seq("a"))
        .filter(pred)
      check(s"bgp#$i", q, SparqlFrontend.run(rdf, q), expected)
    }
  }

  test("sparql: chain joins walk the link predicate") {
    val rnd = new scala.util.Random(Seed + 5)
    for (i <- 1 to 25) {
      val tv = "t" + rnd.nextInt(4)
      val q = s"SELECT ?a ?b WHERE { ?a link ?b . ?b tag '$tv' . }"
      val expected = tri("link").select(col("s").as("a"), col("o").as("b"))
        .join(tri("tag").filter(col("o") === tv).select(col("s").as("b")), Seq("b"))
        .select(col("a"), col("b"))
      check(s"chain#$i", q, SparqlFrontend.run(rdf, q), expected)
    }
  }

  test("sparql: OPTIONAL keeps unmatched subjects with unbound color") {
    val rnd = new scala.util.Random(Seed + 6)
    for (i <- 1 to 25) {
      val tv = "t" + rnd.nextInt(4)
      val q = s"SELECT ?a ?c WHERE { ?a tag '$tv' . OPTIONAL { ?a color ?c } }"
      val expected = tri("tag").filter(col("o") === tv).select(col("s").as("a"))
        .join(tri("color").select(col("s").as("a"), col("o").as("c")),
          Seq("a"), "left")
      check(s"sopt#$i", q, SparqlFrontend.run(rdf, q), expected)
    }
  }

  test("sparql: UNION is a bag union of both branches") {
    val rnd = new scala.util.Random(Seed + 7)
    for (i <- 1 to 25) {
      val tv = "t" + rnd.nextInt(4)
      val cv = "c" + rnd.nextInt(3)
      val q = s"SELECT ?a WHERE { { ?a tag '$tv' } UNION { ?a color '$cv' } }"
      val expected = tri("tag").filter(col("o") === tv).select(col("s").as("a"))
        .unionByName(tri("color").filter(col("o") === cv).select(col("s").as("a")))
      check(s"union#$i", q, SparqlFrontend.run(rdf, q), expected)
    }
  }

  // ---------- Gremlin (r18: extend the differential instrument to the
  // remaining front-ends — each has its own lexer/parser, so syntax-only
  // round-trips leave the same "parses but means the wrong thing" gap the
  // r16 Cypher/SPARQL lexer bugs lived in) ----------

  // a has-step predicate over the CURRENT traverser rendered BOTH as
  // Gremlin text and as a Column against the prefixed expected-side frame
  private def genGremlinHas(rnd: scala.util.Random,
      c: String => Column): (String, Column) = rnd.nextInt(7) match {
    case 0 => val k = rnd.nextInt(7); (s".has('x', gt($k))", c("x") > k)
    case 1 => val k = rnd.nextInt(7); (s".has('x', gte($k))", c("x") >= k)
    case 2 => val k = rnd.nextInt(7); (s".has('x', lt($k))", c("x") < k)
    case 3 => val k = rnd.nextInt(7); (s".has('x', lte($k))", c("x") <= k)
    case 4 => val k = rnd.nextInt(7); (s".has('x', neq($k))", c("x") =!= k)
    case 5 => val k = rnd.nextInt(5); (s".has('y', $k)", c("y") === k)
    case _ => val k = "s" + rnd.nextInt(3); (s".has('s', '$k')", c("s") === k)
  }

  test("gremlin: hasLabel/has chains filter exactly, values projects") {
    val rnd = new scala.util.Random(Seed + 8)
    for (i <- 1 to CasesPerKind) {
      val l = labelOf(rnd)
      val (h1, p1) = genGremlinHas(rnd, k => col(s"a_$k"))
      val (h2, p2) = genGremlinHas(rnd, k => col(s"a_$k"))
      val q = s"g.V().hasLabel('$l')$h1$h2.values('x')"
      val expected = nodesWith(l, "a").filter(p1 && p2).select(col("a_x"))
      check(s"ghas#$i", q, session.gremlin(q), expected)
    }
  }

  test("gremlin: out/in/both steps traverse with bag multiplicity") {
    val rnd = new scala.util.Random(Seed + 9)
    for (i <- 1 to CasesPerKind) {
      val la = labelOf(rnd)
      val t = if (rnd.nextBoolean()) "R" else "S"
      val (h, p) = genGremlinHas(rnd, k => col(s"a_$k"))
      val dir = rnd.nextInt(3)
      val step = Seq("out", "in", "both")(dir)
      val q = s"g.V().hasLabel('$la')$h.$step('$t').values('x')"
      val src = nodesWith(la, "a").filter(p)
      val et = g.edges.filter(col("rel") === t)
      val fwd = et.select(col("src").as("from"), col("dst").as("to"))
      val rev = et.select(col("dst").as("from"), col("src").as("to"))
      val hops = dir match {
        case 0 => fwd
        case 1 => rev
        case _ => fwd.unionByName(rev)
      }
      val expected = src.join(hops, col("a_id") === col("from"))
        .join(g.nodes.select(col("id").as("to"), col("x")), Seq("to"))
        .select(col("x"))
      check(s"gstep#$i", q, session.gremlin(q), expected)
    }
  }

  test("gremlin: groupCount and dedup mean groupBy-count and distinct") {
    val rnd = new scala.util.Random(Seed + 10)
    for (i <- 1 to CasesPerKind) {
      val l = labelOf(rnd)
      val (h, p) = genGremlinHas(rnd, k => col(s"a_$k"))
      val base = nodesWith(l, "a").filter(p)
      if (rnd.nextBoolean()) {
        val q = s"g.V().hasLabel('$l')$h.groupCount().by('s')"
        val expected = base.groupBy(col("a_s")).agg(count(lit(1)).as("count"))
        check(s"ggrp#$i", q, session.gremlin(q), expected)
      } else {
        val q = s"g.V().hasLabel('$l')$h.values('y').dedup()"
        val expected = base.select(col("a_y")).distinct()
        check(s"gdedup#$i", q, session.gremlin(q), expected)
      }
    }
  }

  // ---------- GQL (shares the core grammar with Cypher but lexes and
  // parses through its own front-end — the differential check covers that
  // stack end-to-end with the same generators) ----------

  test("gql: filtered scans and one-hop patterns mean what they say") {
    val rnd = new scala.util.Random(Seed + 11)
    for (i <- 1 to CasesPerKind) {
      if (rnd.nextBoolean()) {
        val l = labelOf(rnd)
        val p = genPred(rnd, "a", k => col(s"a_$k"))
        val q = s"MATCH (a:$l) WHERE ${p.cy} RETURN a.x AS x, a.s AS s"
        val expected = nodesWith(l, "a").filter(p.col)
          .select(col("a_x").as("x"), col("a_s").as("s"))
        check(s"gqlscan#$i", q, session.gql(q), expected)
      } else {
        val (la, lb) = (labelOf(rnd), labelOf(rnd))
        val t = if (rnd.nextBoolean()) "R" else "S"
        val pa = genPred(rnd, "a", k => col(s"a_$k"), 1)
        val q = s"MATCH (a:$la)-[r:$t]->(b:$lb) WHERE ${pa.cy} " +
          "RETURN a.x AS ax, b.y AS by2, r.w AS w"
        val expected = g.edges.filter(col("rel") === t)
          .join(nodesWith(la, "a"), col("src") === col("a_id"))
          .join(nodesWith(lb, "b"), col("dst") === col("b_id"))
          .filter(pa.col)
          .select(col("a_x").as("ax"), col("b_y").as("by2"), col("w"))
        check(s"gqlhop#$i", q, session.gql(q), expected)
      }
    }
  }

  // ---------- GraphQL (5th front-end: root field = label scan, arguments
  // = equality filters, nested fields = inner out-expands along the rel
  // type the field names, flattened prefixed columns) ----------

  test("graphql: argument filters and nested expansions mean scan-filter-join") {
    val rnd = new scala.util.Random(Seed + 13)
    for (i <- 1 to CasesPerKind) {
      val l = labelOf(rnd)
      rnd.nextInt(3) match {
        case 0 => // scalar selections with typed equality arguments
          val y = rnd.nextInt(5)
          val sv = "s" + rnd.nextInt(3)
          val q = s"""{ $l(y: $y, s: "$sv") { x s } }"""
          val expected = nodesWith(l, "a")
            .filter(col("a_y") === y && col("a_s") === sv)
            .select(col("a_x"), col("a_s"))
          check(s"gqlql#$i", q, session.graphql(q), expected)
        case 1 => // nested expansion: one row per out-edge of the named type
          val t = if (rnd.nextBoolean()) "R" else "S"
          val y = rnd.nextInt(5)
          val q = s"{ $l(y: $y) { x $t { s } } }"
          val expected = nodesWith(l, "a").filter(col("a_y") === y)
            .join(g.edges.filter(col("rel") === t), col("a_id") === col("src"))
            .join(g.nodes.select(col("id").as("dst"), col("s")), Seq("dst"))
            .select(col("a_x"), col("s"))
          check(s"gqlql#$i", q, session.graphql(q), expected)
        case _ => // argument on the NESTED field filters the target node
          val t = if (rnd.nextBoolean()) "R" else "S"
          val y = rnd.nextInt(5)
          val q = s"{ $l { x $t(y: $y) { s } } }"
          val expected = nodesWith(l, "a")
            .join(g.edges.filter(col("rel") === t), col("a_id") === col("src"))
            .join(g.nodes.select(col("id").as("dst"), col("y"), col("s")), Seq("dst"))
            .filter(col("y") === y)
            .select(col("a_x"), col("s"))
          check(s"gqlql#$i", q, session.graphql(q), expected)
      }
    }
  }

  test("gql: grouped aggregates match direct groupBy") {
    val rnd = new scala.util.Random(Seed + 12)
    for (i <- 1 to CasesPerKind) {
      val l = labelOf(rnd)
      val p = genPred(rnd, "a", k => col(s"a_$k"), 1)
      val q = s"MATCH (a:$l) WHERE ${p.cy} RETURN a.s AS grp, " +
        "count(*) AS n, sum(a.x) AS t, avg(a.y) AS m"
      val expected = nodesWith(l, "a").filter(p.col)
        .groupBy(col("a_s").as("grp"))
        .agg(count(lit(1)).as("n"), sum("a_x").as("t"), avg("a_y").as("m"))
      check(s"gqlagg#$i", q, session.gql(q), expected)
    }
  }
}
