package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.PropertyGraph

/** GQL typed-schema DDL (reference gql/ast.rs:346 CreateNodeTypeStatement,
  * :357 CreateEdgeTypeStatement): CREATE NODE/EDGE TYPE registers in the
  * session catalog, introspects via schemaTypes, and enforces NOT NULL
  * property presence on the INSERT/CREATE write path.
  */
class GqlSchemaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def emptySession = {
    val nodes = Seq((1L, Seq("Seed"), "x")).toDF("id", "labels", "name")
    val edges = Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel")
    new GraftSession(spark, PropertyGraph(nodes, edges))
  }

  test("CREATE NODE TYPE registers and introspects") {
    val sess = emptySession
    val ddl = sess.gql("CREATE NODE TYPE Person (name STRING NOT NULL, age INT)")
    assert(ddl.collect().head.getLong(2) == 2L)
    sess.gql("CREATE EDGE TYPE KNOWS (since INT)")
    val rows = sess.schemaTypes.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(4)))
    assert(rows.toSeq == Seq(
      ("edge", "KNOWS", "since", true),
      ("node", "Person", "age", true),
      ("node", "Person", "name", false)))
    intercept[IllegalArgumentException](
      sess.gql("CREATE NODE TYPE Person (x INT)"))
  }

  test("INSERT of a typed label enforces NOT NULL properties") {
    val sess = emptySession
    sess.gql("CREATE NODE TYPE Person (name STRING NOT NULL, age INT)")
    // missing NOT NULL property rejected
    val e = intercept[IllegalArgumentException](
      sess.gqlUpdate("INSERT (:Person {id: 2, age: 30})"))
    assert(e.getMessage.contains("name"))
    // present → accepted; untyped labels stay schema-flexible
    val g2 = sess.gqlUpdate("INSERT (:Person {id: 2, name: 'ann'})")
    assert(g2.nodes.count() == 2)
    val g3 = sess.gqlUpdate("INSERT (:Thing {id: 3})")
    assert(g3.nodes.count() == 2)
  }

  test("UNIQUE constraint: violating CREATE errors, MERGE on the key dedups") {
    val nodes = Seq((1L, Seq("User"), "a@x.com"))
      .toDF("id", "labels", "email")
    val edges = Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel")
    val sess = new GraftSession(spark, PropertyGraph(nodes, edges))
    sess.gql("CREATE NODE TYPE User (email STRING NOT NULL UNIQUE)")
    // introspection carries the constraint
    assert(sess.schemaTypes.collect().exists(r =>
      r.getString(2) == "email" && r.getBoolean(5)))
    // duplicate email → constraint violation, nothing mutates
    val e = intercept[IllegalStateException](
      sess.gqlUpdate("INSERT (:User {id: 2, email: 'a@x.com'})"))
    assert(e.getMessage.contains("unique constraint"))
    // fresh email → accepted
    assert(sess.gqlUpdate("INSERT (:User {id: 2, email: 'b@x.com'})")
      .nodes.count() == 2)
    // MERGE keyed on the unique property is the dedup form: no create, no error
    val merged = sess.gqlUpdate("MERGE (u:User {email: 'a@x.com', id: 1})")
    assert(merged.nodes.count() == 1)
    // MERGE on a DIFFERENT key that would create a duplicate email → error
    val e2 = intercept[IllegalStateException](
      sess.gqlUpdate("MERGE (u:User {id: 7, email: 'a@x.com'})"))
    assert(e2.getMessage.contains("unique constraint"))
    // MERGE on a different key that MATCHES takes the match path: no probe failure
    assert(sess.gqlUpdate("MERGE (u:User {id: 1, email: 'a@x.com'})")
      .nodes.count() == 1)
    // one STATEMENT creating the same unique value twice must also violate
    // (each clause alone probes the pre-mutation graph and would pass)
    val e3 = intercept[IllegalStateException](sess.gqlUpdate(
      "CREATE (:User {id: 8, email: 'c@x.com'}) CREATE (:User {id: 9, email: 'c@x.com'})"))
    assert(e3.getMessage.contains("unique constraint"))
  }

  test("MERGE keyed on one unique property still probes the OTHER unique props") {
    // two UNIQUE properties on one type: a MERGE keyed on `email` (unique)
    // whose create path would insert a TAKEN `handle` must violate — the
    // merge-on-unique short-circuit exempts only the merge key itself
    val nodes = Seq((1L, Seq("User"), "a@x.com", "alice"))
      .toDF("id", "labels", "email", "handle")
    val edges = Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel")
    val sess = new GraftSession(spark, PropertyGraph(nodes, edges))
    sess.gql("CREATE NODE TYPE User (email STRING UNIQUE, handle STRING UNIQUE)")
    val e = intercept[IllegalStateException](
      sess.gqlUpdate("MERGE (u:User {email: 'new@x.com', handle: 'alice', id: 30})"))
    assert(e.getMessage.contains("unique constraint") &&
      e.getMessage.contains("handle"))
    // fresh values on both → create path accepted
    assert(sess.gqlUpdate("MERGE (u:User {email: 'new@x.com', handle: 'bob', id: 30})")
      .nodes.count() == 2)
    // MATCH path (email exists) never probes the second unique prop
    assert(sess.gqlUpdate("MERGE (u:User {email: 'a@x.com', handle: 'alice', id: 1})")
      .nodes.count() == 1)
  }

  test("computed-constant unique values are folded and probed for real") {
    val nodes = Seq((1L, Seq("User"), "a@x.com")).toDF("id", "labels", "email")
    val edges = Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel")
    val sess = new GraftSession(spark, PropertyGraph(nodes, edges))
    sess.gql("CREATE NODE TYPE User (email STRING UNIQUE)")
    // a variable-free expression constant-folds: 'A@X.COM' is fresh →
    // the insert passes the probe (the old literal-only probe REJECTED it)
    assert(sess.gqlUpdate("INSERT (:User {id: 2, email: toUpper('a@x.com')})")
      .nodes.count() == 2)
    // … and a folded value that IS taken violates like a literal would
    val e = intercept[IllegalStateException](
      sess.gqlUpdate("INSERT (:User {id: 3, email: toLower('A@X.COM')})"))
    assert(e.getMessage.contains("unique constraint"))
  }

  test("MERGE keyed on a computed-constant unique key takes the MATCH path unprobed") {
    // the review scenario: both props UNIQUE, the merge key is a computed
    // CONSTANT that matches an existing node — the merge must take the
    // MATCH path without probing `handle` against the matched node itself
    val nodes = Seq((1L, Seq("User"), "a@x.com", "alice"))
      .toDF("id", "labels", "email", "handle")
    val edges = Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel")
    val sess = new GraftSession(spark, PropertyGraph(nodes, edges))
    sess.gql("CREATE NODE TYPE User (email STRING UNIQUE, handle STRING UNIQUE)")
    assert(sess.gqlUpdate(
      "MERGE (u:User {email: toLower('A@X.COM'), handle: 'alice', id: 1})")
      .nodes.count() == 1, "computed key folds to the matched value: MATCH path")
    // computed key that does NOT match + taken second unique → create-path
    // probe still fires
    val e = intercept[IllegalStateException](sess.gqlUpdate(
      "MERGE (u:User {email: toLower('NEW@X.COM'), handle: 'alice', id: 9})"))
    assert(e.getMessage.contains("handle"))
  }

  test("MERGE probe is label-blind, matching mergeNodes' key semantics") {
    // an Other node already owns key id=7; MERGE (:User {id: 7, email: dup})
    // takes the MATCH path label-blind, so the unique probe must not fire
    val nodes = Seq(
      (7L, Seq("Other"), null.asInstanceOf[String]),
      (1L, Seq("User"), "a@x.com")).toDF("id", "labels", "email")
    val edges = Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel")
    val sess = new GraftSession(spark, PropertyGraph(nodes, edges))
    sess.gql("CREATE NODE TYPE User (email STRING UNIQUE)")
    val merged = sess.gqlUpdate("MERGE (u:User {id: 7, email: 'a@x.com'})")
    assert(merged.nodes.count() == 2, "match path must not create or reject")
  }
}
