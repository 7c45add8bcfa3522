package graft.frontends.graphql

import graft.graph.Out
import graft.ir.{Expr, Op}

/** GraphQL→LPG front-end (SURVEY §2.8; reference graphql_translator.rs:1-40,
  * 130): the root field is a label scan, its arguments are equality filters,
  * nested selection sets are Expands along the relationship type named by
  * the field, and scalar fields are property projections.
  *
  *   { Customer(category: "BUILDING") { name acctbal FROM_NATION { name } } }
  *
  * Output is the flattened relation: one column per scalar field, nested
  * fields prefixed with their path (FROM_NATION_name).
  */
object GraphQLFrontend {

  final case class Field(name: String, args: Seq[(String, Any)],
      selections: Seq[Field])

  // ---- parser ----
  def parse(q: String): Field = {
    var i = 0
    val n = q.length
    def ws(): Unit = while (i < n && (q(i).isWhitespace || q(i) == ',')) i += 1
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"graphql parse error at $i: $msg")
    def ident(): String = {
      ws()
      val start = i
      while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
      if (i == start) fail("expected name")
      q.substring(start, i)
    }
    def value(): Any = {
      ws()
      q(i) match {
        case '"' =>
          val sb = new StringBuilder
          i += 1
          // backslash escapes (GraphQL spec StringValue), matching the
          // Cypher/SPARQL/Gremlin lexers
          while (i < n && q(i) != '"') {
            if (q(i) == '\\') i = graft.frontends.Lexing.readEscape(q, i, sb)
            else { sb += q(i); i += 1 }
          }
          if (i >= n) fail("unterminated string")
          i += 1
          sb.toString
        case c if c.isDigit || c == '-' =>
          val start = i
          i += 1
          while (i < n && (q(i).isDigit || q(i) == '.')) i += 1
          val s = q.substring(start, i)
          if (s.contains('.')) s.toDouble else s.toLong
        case _ => ident() match {
          case "true" => true
          case "false" => false
          case "null" => null
          case other => other
        }
      }
    }
    def field(): Field = {
      val name = ident()
      ws()
      val args = Seq.newBuilder[(String, Any)]
      if (i < n && q(i) == '(') {
        i += 1
        ws()
        while (i < n && q(i) != ')') {
          val k = ident()
          ws()
          if (i >= n || q(i) != ':') fail("expected :")
          i += 1
          args += ((k, value()))
          ws()
        }
        i += 1
      }
      ws()
      val sels = Seq.newBuilder[Field]
      if (i < n && q(i) == '{') {
        i += 1
        ws()
        while (i < n && q(i) != '}') { sels += field(); ws() }
        if (i >= n) fail("unterminated selection set")
        i += 1
      }
      Field(name, args.result(), sels.result())
    }
    ws()
    if (i >= n || q(i) != '{') fail("query must start with {")
    i += 1
    val root = field()
    ws()
    if (i >= n || q(i) != '}') fail("expected closing }")
    i += 1
    ws()
    if (i < n) fail(s"trailing input: ${q.substring(i)}")
    root
  }

  /** Top-level document: an optional `mutation` keyword before the selection
    * block (reference graphql_translator.rs:130) — returns (isMutation, root).
    */
  def parseDocument(q: String): (Boolean, Field) = {
    val t = q.trim
    if (t.length > 8 && t.substring(0, 8).equalsIgnoreCase("mutation") &&
        (t(8).isWhitespace || t(8) == '{'))
      (true, parse(t.substring(8)))
    else (false, parse(q))
  }

  // ---- translate to IR ----
  def translate(q: String): Op.T = {
    val root = parse(q)
    var anon = 0
    def fresh(): String = { anon += 1; s"__q$anon" }

    val rootVar = fresh()
    var op: Op.T = Op.NodeScan(rootVar, Some(root.name))
    val projections = Seq.newBuilder[(Expr.E, String)]

    def argFilters(v: String, args: Seq[(String, Any)]): Unit =
      args.foreach { case (k, value) =>
        op = Op.Filter(op, Expr.Bin("=", Expr.Prop(v, k), Expr.Lit(value)))
      }

    def walk(v: String, f: Field, prefix: String): Unit = {
      argFilters(v, f.args)
      f.selections.foreach { sub =>
        if (sub.selections.isEmpty && sub.args.isEmpty) {
          val colName = if (prefix.isEmpty) sub.name else s"${prefix}${sub.name}"
          val e: Expr.E =
            if (sub.name == "id") Expr.Var(v) else Expr.Prop(v, sub.name)
          projections += ((e, colName))
        } else {
          // nested field = expand along the relationship type it names
          val to = fresh()
          op = Op.Expand(op, v, Seq(sub.name), to, Out, None)
          walk(to, sub, s"$prefix${sub.name}_")
        }
      }
    }
    walk(rootVar, root, "")
    Op.Project(op, projections.result())
  }
}
