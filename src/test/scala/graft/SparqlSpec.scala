package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.frontends.sparql.{SparqlCompiler, SparqlFrontend}
import graft.graph.{TpchRdf, TripleGraph}
import graft.ir.Expr

class SparqlSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  lazy val rdf: TripleGraph = TpchRdf(spark, sf)

  test("string builtins: STRBEFORE/STRAFTER/ENCODE_FOR_URI semantics") {
    val c = new SparqlCompiler(rdf)
    val df = Seq(("Customer#000000001", "a b/c")).toDF("s", "u")
    val row = df.select(
      c.expr(Expr.Func("STRBEFORE", Seq(Expr.Var("s"), Expr.Lit("#")))),
      c.expr(Expr.Func("STRAFTER", Seq(Expr.Var("s"), Expr.Lit("#")))),
      c.expr(Expr.Func("STRBEFORE", Seq(Expr.Var("s"), Expr.Lit("X")))), // absent → ''
      c.expr(Expr.Func("ENCODE_FOR_URI", Seq(Expr.Var("u"))))).collect().head
    assert(row.getString(0) == "Customer")
    assert(row.getString(1) == "000000001")
    assert(row.getString(2) == "")
    assert(row.getString(3) == "a%20b%2Fc")
  }

  test("typed-literal builtins: STR/LANG/DATATYPE/STRLANG/STRDT/SAMETERM") {
    val c = new SparqlCompiler(rdf)
    val df = Seq(("chat@en", "42^^xsd:int", "plain")).toDF("l", "d", "s")
    val row = df.select(
      c.expr(Expr.Func("STR", Seq(Expr.Var("l")))),
      c.expr(Expr.Func("STR", Seq(Expr.Var("d")))),
      c.expr(Expr.Func("LANG", Seq(Expr.Var("l")))),
      c.expr(Expr.Func("LANG", Seq(Expr.Var("s")))),
      c.expr(Expr.Func("DATATYPE", Seq(Expr.Var("d")))),
      c.expr(Expr.Func("DATATYPE", Seq(Expr.Var("l")))),
      c.expr(Expr.Func("DATATYPE", Seq(Expr.Var("s")))),
      c.expr(Expr.Func("STRLANG", Seq(Expr.Var("s"), Expr.Lit("fr")))),
      c.expr(Expr.Func("STRDT", Seq(Expr.Var("s"), Expr.Lit("xsd:string")))),
      c.expr(Expr.Func("SAMETERM", Seq(Expr.Var("l"), Expr.Var("l"))))).collect().head
    assert(row.getString(0) == "chat" && row.getString(1) == "42")
    assert(row.getString(2) == "en" && row.getString(3) == "")
    assert(row.getString(4) == "xsd:int")
    assert(row.getString(5) == "rdf:langString")
    assert(row.getString(6) == "xsd:string")
    assert(row.getString(7) == "plain@fr" && row.getString(8) == "plain^^xsd:string")
    assert(row.getBoolean(9))
  }

  test("LANGMATCHES: exact, wildcard, and prefix ranges") {
    val c = new SparqlCompiler(rdf)
    val df = Seq(("en", "en-GB", "")).toDF("a", "b", "none")
    val row = df.select(
      c.expr(Expr.Func("LANGMATCHES", Seq(Expr.Var("a"), Expr.Lit("EN")))),
      c.expr(Expr.Func("LANGMATCHES", Seq(Expr.Var("b"), Expr.Lit("en")))),
      c.expr(Expr.Func("LANGMATCHES", Seq(Expr.Var("a"), Expr.Lit("*")))),
      c.expr(Expr.Func("LANGMATCHES", Seq(Expr.Var("none"), Expr.Lit("*")))),
      c.expr(Expr.Func("LANGMATCHES", Seq(Expr.Var("a"), Expr.Lit("fr"))))).collect().head
    assert(row.getBoolean(0) && row.getBoolean(1) && row.getBoolean(2))
    assert(!row.getBoolean(3) && !row.getBoolean(4))
  }

  test("hash/date/regex builtins match reference semantics") {
    val c = new SparqlCompiler(rdf)
    val df = Seq(("abc", "1994-06-15^^xsd:date", "2020-01-02T03:04:05Z^^xsd:dateTime"))
      .toDF("s", "d", "ts")
    val row = df.select(
      c.expr(Expr.Func("MD5", Seq(Expr.Var("s")))),
      c.expr(Expr.Func("SHA1", Seq(Expr.Var("s")))),
      c.expr(Expr.Func("SHA256", Seq(Expr.Var("s")))),
      c.expr(Expr.Func("YEAR", Seq(Expr.Var("d")))),
      c.expr(Expr.Func("MONTH", Seq(Expr.Var("d")))),
      c.expr(Expr.Func("DAY", Seq(Expr.Var("d")))),
      c.expr(Expr.Func("HOURS", Seq(Expr.Var("ts")))),
      c.expr(Expr.Func("MINUTES", Seq(Expr.Var("ts")))),
      c.expr(Expr.Func("SECONDS", Seq(Expr.Var("ts")))),
      c.expr(Expr.Func("TIMEZONE", Seq(Expr.Var("ts")))),
      c.expr(Expr.Func("REGEX", Seq(Expr.Var("s"), Expr.Lit("^a")))),
      c.expr(Expr.Func("REGEX", Seq(Expr.Var("s"), Expr.Lit("^B"), Expr.Lit("i"))))).collect().head
    assert(row.getString(0) == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(row.getString(1) == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(row.getString(2) == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(row.getInt(3) == 1994 && row.getInt(4) == 6 && row.getInt(5) == 15)
    assert(row.getInt(6) == 3 && row.getInt(7) == 4 && row.getInt(8) == 5)
    assert(row.getString(9) == "Z")
    assert(row.getBoolean(10) && !row.getBoolean(11))
  }

  test("IRI/BNODE/UUID constructors have the right shapes") {
    val c = new SparqlCompiler(rdf)
    val df = Seq(("n:1", "label")).toDF("iri", "x")
    val row = df.select(
      c.expr(Expr.Func("IRI", Seq(Expr.Var("iri")))),
      c.expr(Expr.Func("BNODE", Seq(Expr.Var("x")))),
      c.expr(Expr.Func("BNODE", Seq(Expr.Var("x")))),
      c.expr(Expr.Func("BNODE", Seq.empty)),
      c.expr(Expr.Func("UUID", Seq.empty)),
      c.expr(Expr.Func("STRUUID", Seq.empty)),
      c.expr(Expr.Func("ISBLANK", Seq(Expr.Func("BNODE", Seq(Expr.Var("x"))))))).collect().head
    assert(row.getString(0) == "n:1")
    assert(row.getString(1).startsWith("_:b") && row.getString(1) == row.getString(2))
    assert(row.getString(3).startsWith("_:"))
    assert(row.getString(4).startsWith("urn:uuid:"))
    assert(row.getString(5).matches("[0-9a-f-]{36}"))
    assert(row.getBoolean(6))
  }

  test("vector extension functions over bracketed literals") {
    val c = new SparqlCompiler(rdf)
    val df = Seq(("[1, 0, 0]", "[0, 1, 0]")).toDF("u", "v")
    def vec(name: String) = Expr.Func("VECTOR", Seq(Expr.Var(name)))
    val row = df.select(
      c.expr(Expr.Func("COSINE_SIMILARITY", Seq(vec("u"), vec("u")))),
      c.expr(Expr.Func("COSINE_SIMILARITY", Seq(vec("u"), vec("v")))),
      c.expr(Expr.Func("EUCLIDEAN_DISTANCE", Seq(vec("u"), vec("v")))),
      c.expr(Expr.Func("DOT_PRODUCT", Seq(vec("u"), vec("v")))),
      c.expr(Expr.Func("MANHATTAN_DISTANCE", Seq(vec("u"), vec("v"))))).collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(row.getDouble(1)) < 1e-6)
    assert(math.abs(row.getDouble(2) - math.sqrt(2)) < 1e-6)
    assert(math.abs(row.getDouble(3)) < 1e-6)
    assert(math.abs(row.getDouble(4) - 2.0) < 1e-6)
  }

  test("BOUND distinguishes OPTIONAL misses") {
    val out = SparqlFrontend.run(rdf,
      """SELECT ?nn ?has WHERE {
        |  ?nat name ?nn .
        |  FILTER(STRSTARTS(?nat, 'n:'))
        |  OPTIONAL { ?s inNation ?nat . FILTER(STRSTARTS(?s, 's:')) }
        |  BIND(IF(BOUND(?s), 'y', 'n') AS ?has)
        |} ORDER BY ?nn""".stripMargin).collect()
    assert(out.map(_.getString(1)).toSet == Set("y", "n"))
  }

  test("property path inverse ^ swaps direction") {
    val got = SparqlFrontend.run(TpchRdf.withPaths(spark, sf),
      "SELECT ?n WHERE { r:0 ^inRegion ?n } ORDER BY ?n")
      .collect().map(_.getString(0)).toSeq
    val exp = spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_regionkey") === 0)
      .select(concat(lit("n:"), col("n_nationkey"))).collect()
      .map(_.getString(0)).toSeq.sorted
    assert(got == exp && got.nonEmpty)
  }

  test("property path * includes the zero-length endpoint") {
    val star = SparqlFrontend.run(TpchRdf.withPaths(spark, sf),
      "SELECT ?d WHERE { pt:40 child* ?d } ORDER BY ?d")
      .collect().map(_.getString(0)).toSet
    val plus = SparqlFrontend.run(TpchRdf.withPaths(spark, sf),
      "SELECT ?d WHERE { pt:40 child+ ?d } ORDER BY ?d")
      .collect().map(_.getString(0)).toSet
    assert(star == plus + "pt:40")
    assert(plus.contains("pt:80") && plus.contains("pt:81")) // children
    assert(plus.contains("pt:160")) // grandchild via 80
  }

  test("property path ? is zero-or-one") {
    val got = SparqlFrontend.run(TpchRdf.withPaths(spark, sf),
      "SELECT ?d WHERE { pt:40 child? ?d } ORDER BY ?d")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("pt:40", "pt:80", "pt:81"))
  }

  test("unseeded + closure still terminates and matches per-seed result") {
    // both ends unbound: all-pairs closure over the (bounded-depth) tree
    val pairs = SparqlFrontend.run(TpchRdf.withPaths(spark, sf),
      "SELECT ?a ?b WHERE { ?a child+ ?b FILTER(?a = 'pt:40') } ORDER BY ?b")
      .collect().map(_.getString(1)).toSet
    val seeded = SparqlFrontend.run(TpchRdf.withPaths(spark, sf),
      "SELECT ?d WHERE { pt:40 child+ ?d }")
      .collect().map(_.getString(0)).toSet
    assert(pairs == seeded)
  }

  test("negated property set: single, set, inverse, and mixed forms") {
    // !name on c:1 — everything about the customer except its name
    val single = SparqlFrontend.run(rdf,
      "SELECT ?o WHERE { c:1 !name ?o } ORDER BY ?o")
      .collect().map(_.getString(0)).toSet
    val all = SparqlFrontend.run(rdf,
      "SELECT ?p ?o WHERE { c:1 ?p ?o }")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(single == all.filter(_._1 != "name").map(_._2).toSet && single.nonEmpty)
    // inverse-only: !(^inNation) from a nation = reversed non-inNation edges
    // into it — nations only receive inNation, so empty
    val invOnly = SparqlFrontend.run(rdf,
      "SELECT ?x WHERE { n:0 !(^inNation) ?x }").collect()
    assert(invOnly.isEmpty)
    // mixed: forward part (non-name edges out of n:0 — none, nations only
    // have name) ∪ inverse part (reversed non-segment edges — the members
    // pointing in via inNation and the name literal's holder via ^name? no:
    // ^ reverses (o,s), so subjects whose triples TARGET n:0 with p ∉ {segment})
    val mixed = SparqlFrontend.run(rdf,
      "SELECT ?x WHERE { n:0 !(name|^segment) ?x } ORDER BY ?x")
      .collect().map(_.getString(0)).toSet
    val members = rdf.triples.filter(col("o") === "n:0" && col("p") =!= "segment")
      .select("s").collect().map(_.getString(0)).toSet
    assert(mixed == members && members.nonEmpty)
  }

  test("a keyword matches rdf:type triples") {
    val got = SparqlFrontend.run(TpchRdf.withTypes(spark, sf),
      "SELECT ?n WHERE { ?n a Nation } ORDER BY ?n")
      .collect().map(_.getString(0)).toSeq
    val exp = spark.read.parquet(s"$sf/nation.parquet")
      .select(concat(lit("n:"), col("n_nationkey"))).collect()
      .map(_.getString(0)).toSeq.sorted
    assert(got == exp && got.nonEmpty)
  }

  test("FILTER NOT EXISTS anti-joins; EXISTS and NOT EXISTS partition") {
    val ex = SparqlFrontend.run(rdf,
      """SELECT ?nn WHERE { ?nat name ?nn . FILTER(STRSTARTS(?nat, 'n:'))
        |  FILTER EXISTS { ?s inNation ?nat . FILTER(STRSTARTS(?s, 's:')) } }""".stripMargin)
      .collect().map(_.getString(0)).toSet
    val notEx = SparqlFrontend.run(rdf,
      """SELECT ?nn WHERE { ?nat name ?nn . FILTER(STRSTARTS(?nat, 'n:'))
        |  FILTER NOT EXISTS { ?s inNation ?nat . FILTER(STRSTARTS(?s, 's:')) } }""".stripMargin)
      .collect().map(_.getString(0)).toSet
    val all = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_name").collect().map(_.getString(0)).toSet
    assert((ex & notEx).isEmpty && (ex | notEx) == all && ex.nonEmpty)
  }

  test("VALUES with a tuple row list") {
    val got = SparqlFrontend.run(rdf,
      """SELECT ?c ?seg WHERE {
        |  ?c segment ?seg .
        |  VALUES (?seg) { ('BUILDING') }
        |} ORDER BY ?c""".stripMargin).collect()
    val exp = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").count()
    assert(got.length == exp && got.forall(_.getString(1) == "BUILDING"))
  }

  test("parse errors are IllegalArgumentException") {
    assertThrows[IllegalArgumentException](SparqlFrontend.parse("SELECT ?x WHERE { ?x"))
    assertThrows[IllegalArgumentException](SparqlFrontend.parse("WHERE { ?s ?p ?o }"))
  }

  test("numeric FILTER arithmetic") {
    val out = SparqlFrontend.run(rdf,
      """SELECT ?nn ?l2 WHERE {
        |  ?nat name ?nn .
        |  FILTER(STRSTARTS(?nat, 'n:'))
        |  BIND(STRLEN(?nn) * 2 AS ?l2)
        |  FILTER(?l2 >= 16)
        |} ORDER BY ?nn""".stripMargin).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) >= 16))
  }

  test("DESCRIBE <iri> without WHERE returns that subject's triples") {
    val rows = SparqlFrontend.run(rdf, "DESCRIBE c:1")
      .orderBy("p").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("inNation", "name", "segment"))
    assert(rows.forall(_.getString(0) == "c:1"))
  }

  test("DESCRIBE with several targets unions their descriptions") {
    val rows = SparqlFrontend.run(rdf, "DESCRIBE c:1 n:0")
      .select("s").distinct().collect().map(_.getString(0)).toSeq.sorted
    assert(rows == Seq("c:1", "n:0"))
  }

  test("subquery aggregates join the outer group on shared vars") {
    val out = SparqlFrontend.run(rdf,
      """SELECT ?nn ?cnt WHERE {
        |  ?n name ?nn .
        |  { SELECT ?n (COUNT(*) AS ?cnt) WHERE { ?m inNation ?n } GROUP BY ?n }
        |} ORDER BY ?nn""".stripMargin).collect()
    assert(out.nonEmpty)
    // only nation subjects survive the join, and counts are positive
    assert(out.forall(_.getLong(1) >= 1))
  }

  test("GRAPH with a constant name scopes the body to that graph") {
    val store = graft.graph.QuadStore.fromDocuments(spark, sf)
    val default = TripleGraph(store.quads.select("s", "p", "o"))
    val sources = store.quads.select("g").distinct()
      .collect().map(_.getString(0)).sorted
    val g0 = sources.head
    val got = SparqlFrontend.run(default,
      s"SELECT ?s WHERE { GRAPH $g0 { ?s lang ?l } } ORDER BY ?s", store)
      .collect().map(_.getString(0)).toSeq
    val exp = store.quads.filter(col("g") === g0 && col("p") === "lang")
      .select("s").collect().map(_.getString(0)).toSeq.sorted
    assert(got == exp && got.nonEmpty)
  }

  test("GRAPH ?g binds the graph name and joins same-graph only") {
    val store = graft.graph.QuadStore.fromDocuments(spark, sf)
    val default = TripleGraph(store.quads.select("s", "p", "o"))
    val got = SparqlFrontend.run(default,
      "SELECT ?g ?s WHERE { GRAPH ?g { ?s lang ?l . ?s nchars ?n } } ORDER BY ?g ?s",
      store).collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val exp = store.quads.filter(col("p") === "lang").select("g", "s")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(got == exp && got.nonEmpty)
  }

  test("GRAPH ?g accepts FILTER/OPTIONAL/UNION inside the block") {
    val store = graft.graph.QuadStore.fromDocuments(spark, sf)
    val default = TripleGraph(store.quads.select("s", "p", "o"))
    // FILTER scoped to the named-graph block
    val filtered = SparqlFrontend.run(default,
      """SELECT ?g ?s WHERE {
        |  GRAPH ?g { ?s lang ?l . FILTER(?l = 'en') }
        |} ORDER BY ?g ?s""".stripMargin, store)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val expF = store.quads.filter(col("p") === "lang" && col("o") === "en")
      .select("g", "s").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(filtered == expF && filtered.nonEmpty)
    // OPTIONAL stays same-graph via the shared ?g binding
    val opt = SparqlFrontend.run(default,
      """SELECT ?g ?s ?n WHERE {
        |  GRAPH ?g { ?s lang ?l OPTIONAL { ?s nchars ?n } }
        |} ORDER BY ?g ?s""".stripMargin, store)
      .collect()
    assert(opt.length == expFUniverse(store) && opt.forall(!_.isNullAt(2)))
    // UNION of two single-leg blocks
    val uni = SparqlFrontend.run(default,
      """SELECT ?g ?s WHERE {
        |  GRAPH ?g { { ?s lang 'en' } UNION { ?s lang 'de' } }
        |} ORDER BY ?g ?s""".stripMargin, store)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val expU = store.quads.filter(col("p") === "lang" && col("o").isin("en", "de"))
      .select("g", "s").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(uni == expU)
  }

  private def expFUniverse(store: graft.graph.QuadStore): Long =
    store.quads.filter(col("p") === "lang").count()

  test("SERVICE is parsed and rejected with a federation error") {
    val e = intercept[IllegalArgumentException](
      SparqlFrontend.run(rdf,
        "SELECT ?s WHERE { SERVICE <http://example.org/sparql> { ?s name ?o } }"))
    assert(e.getMessage.contains("SERVICE"))
    assert(e.getMessage.contains("not supported"))
  }

  test("SERVICE SILENT evaluates the inner pattern locally (reference semantics)") {
    // sparql_translator.rs:673-680 evaluates the pattern against the local
    // store and ignores the endpoint — SERVICE SILENT must equal the same
    // query without the SERVICE wrapper, endpoint notwithstanding
    val plain = SparqlFrontend.run(rdf,
      "SELECT ?s ?o WHERE { ?s name ?o } ORDER BY ?s ?o")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val silent = SparqlFrontend.run(rdf,
      """SELECT ?s ?o WHERE {
        |  SERVICE SILENT <http://example.org/sparql> { ?s name ?o }
        |} ORDER BY ?s ?o""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(silent == plain && plain.nonEmpty)
    // and it joins with the enclosing group like any other pattern
    val joined = SparqlFrontend.run(rdf,
      """SELECT ?s ?o WHERE {
        |  ?s segment ?seg .
        |  SERVICE SILENT <http://example.org/sparql> { ?s name ?o }
        |} ORDER BY ?s ?o""".stripMargin).collect()
    assert(joined.nonEmpty && joined.length <= plain.length)
  }

  test("SPARQL update: LOAD reads N-Triples into a named graph") {
    val nt = java.nio.file.Files.createTempFile("graft_spec", ".nt")
    java.nio.file.Files.writeString(nt,
      "<a> <p> <b> .\n<a> <p> \"lit value\" .\n# comment\n\n_:b1 <p> <c> .\n")
    val store = graft.graph.QuadStore.fromDocuments(spark, sf)
    val after = graft.frontends.sparql.SparqlUpdates.run(spark, store,
      s"LOAD <file:$nt> INTO GRAPH <g1>")
    val g1 = after.quads.filter(col("g") === "g1")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(g1 == Set(("a", "p", "b"), ("a", "p", "lit value"), ("_:b1", "p", "c")))
    // graph-management statements compose with ';'
    val gone = graft.frontends.sparql.SparqlUpdates.run(spark, after,
      "CREATE GRAPH <g2>; COPY <g1> TO <g2>; CLEAR GRAPH <g1>")
    assert(gone.quads.filter(col("g") === "g1").count() == 0)
    assert(gone.quads.filter(col("g") === "g2").count() == 3)
    val bad = intercept[IllegalArgumentException](
      graft.frontends.sparql.SparqlUpdates.run(spark, store, "FROBNICATE <x>"))
    assert(bad.getMessage.contains("unsupported"))
  }

  test("update statement split ignores semicolons inside IRIs") {
    import graft.frontends.sparql.SparqlUpdates.splitStatements
    assert(splitStatements("LOAD <file:/tmp/a;b.nt>; CLEAR GRAPH <g;1>")
      == Seq("LOAD <file:/tmp/a;b.nt>", " CLEAR GRAPH <g;1>"))
    assert(splitStatements("CREATE GRAPH <g2>; COPY <g1> TO <g2>")
      == Seq("CREATE GRAPH <g2>", " COPY <g1> TO <g2>"))
    // a LOAD of an IRI containing ';' parses as one statement end-to-end
    val nt = java.nio.file.Files.createTempFile("graft_semi;colon", ".nt")
    java.nio.file.Files.writeString(nt, "<a> <p> <b> .\n")
    val store = graft.graph.QuadStore.fromDocuments(spark, sf)
    val after = graft.frontends.sparql.SparqlUpdates.run(spark, store,
      s"LOAD <file:$nt> INTO GRAPH <gsemi>")
    assert(after.quads.filter(col("g") === "gsemi").count() == 1)
  }

  test("GRAPH without a dataset is a clear error") {
    val e = intercept[IllegalArgumentException](
      SparqlFrontend.run(rdf, "SELECT ?s WHERE { GRAPH ?g { ?s name ?o } }"))
    assert(e.getMessage.contains("named graphs"))
  }
}
