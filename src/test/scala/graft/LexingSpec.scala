package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.frontends.Lexing
import graft.frontends.sparql.SparqlLexer
import graft.frontends.gremlin.GremlinFrontend
import graft.frontends.graphql.GraphQLFrontend

/** String-literal escape semantics shared by the five front-end lexers
  * (r16 ADVICE: the pass-through handling yielded 'n' for `\n`), plus the
  * SPARQL IRI-vs-operator disambiguation for space-free comparisons.
  */
class LexingSpec extends AnyFunSuite {
  import TestSpark._

  private def decode(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\') i = Lexing.readEscape(s, i, sb)
      else { sb += s(i); i += 1 }
    }
    sb.toString
  }

  test("readEscape: standard escapes map to their characters") {
    assert(decode("a\\nb") == "a\nb")
    assert(decode("\\t\\r\\b\\f") == "\t\r\b\f")
    assert(decode("\\\"\\'\\\\\\/") == "\"'\\/")
    assert(decode("\\u0041\\u00e9") == "Aé")
    assert(decode("\\U0001F600") == new String(Character.toChars(0x1F600)))
    // lenient degradation: unknown escape and malformed \u keep the chars
    assert(decode("\\q") == "q")
    assert(decode("\\u12GZ") == "u12GZ")
    assert(decode("tail\\") == "tail\\")
  }

  test("readEscape: out-of-range \\U degrades leniently instead of throwing") {
    // r17 ADVICE: 8 hex digits can exceed Int.MaxValue (NumberFormatException
    // via Integer.parseInt) or U+10FFFF (IllegalArgumentException via
    // Character.toChars) — both must take the documented pass-through
    assert(decode("\\UFFFFFFFF") == "UFFFFFFFF")
    assert(decode("\\U00110000") == "U00110000")
    assert(decode("\\U7FFFFFFF") == "U7FFFFFFF")
    // boundary: the largest valid code point still decodes
    assert(decode("\\U0010FFFF") == new String(Character.toChars(0x10FFFF)))
  }

  test("cypher string literals decode spec escapes end-to-end") {
    val s = new GraftSession(spark, graft.graph.TpchGraph(spark, sf))
    val row = s.cypher("RETURN 'a\\nb' AS x, '\\u0041\\\\' AS y").collect().head
    assert(row.getString(0) == "a\nb")
    assert(row.getString(1) == "A\\")
  }

  test("gremlin and graphql string literals decode spec escapes") {
    val st = GremlinFrontend.parseSteps("g.V().has('k', 'a\\nb\\u0041')")
    assert(st.exists(_.args.contains("a\nbA")))
    val f = GraphQLFrontend.parse("{ q(name: \"a\\nb\\u0041\") { id } }")
    def allArgs(fl: graft.frontends.graphql.GraphQLFrontend.Field): Seq[Any] =
      fl.args.map(_._2) ++ fl.selections.flatMap(allArgs)
    assert(allArgs(f).contains("a\nbA"))
  }

  test("sparql lexer: space-free comparison chains are operators, not IRIs") {
    import SparqlLexer._
    // ADVICE r16: the body '?y&&?z' has no whitespace/'<' but can never be
    // an IRI — a variable cannot open an IRIREF
    val toks = SparqlLexer.lex("FILTER(?x<?y&&?z>5)")
    assert(toks.contains(Sym("<")) && toks.contains(Sym(">")))
    assert(toks.contains(VarT("y")) && toks.contains(VarT("z")))
    assert(!toks.exists { case Word(w) => w.contains("&&"); case _ => false })
    // IRIREF-excluded characters in the body also force the operator read
    val t2 = SparqlLexer.lex("FILTER(?x<\"a\" && ?y>2)")
    assert(t2.contains(Sym("<")) && t2.contains(StrT("a")))
    // real IRIs (query strings included) still lex as one IRI token
    val t3 = SparqlLexer.lex("<http://example.org/p?x=1>")
    assert(t3 == Vector(Word("http://example.org/p?x=1")))
  }
}
