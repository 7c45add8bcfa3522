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
}
