package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.compiler.Compiler
import graft.frontends.cypher.CypherFrontend
import graft.graph.PropertyGraph

/** User-facing session over one property graph — the Spark-native analog of
  * the reference's `GrafeoDB` facade + `Session`
  * (crates/grafeo-engine/src/database.rs:327, src/session.rs:160).
  * Each query language front-end parses to the shared IR; the compiler
  * lowers IR to a DataFrame, and Catalyst takes it from there.
  */
final class GraftSession(val spark: SparkSession, val graph: PropertyGraph) {
  private val compiler = new Compiler(spark, graph)

  /** openCypher entry point (reference Session::execute_cypher,
    * session.rs:290).
    */
  def cypher(query: String): DataFrame =
    compiler.compile(CypherFrontend.translate(CypherFrontend.parse(query)))

  /** Parameterized openCypher: `$name` placeholders bind to `params` at
    * translate time (reference processor.rs:417-600), so Catalyst receives
    * plain literals — filter pushdown and constant folding apply as if the
    * values were inlined.
    */
  def cypher(query: String, params: Map[String, Any]): DataFrame =
    compiler.compile(CypherFrontend.bindParams(
      CypherFrontend.translate(CypherFrontend.parse(query)), params))

  /** GQL entry point (reference GrafeoDB::execute, database.rs:327). The ISO
    * GQL core pattern surface (MATCH/WHERE/RETURN/ORDER BY/LIMIT…) coincides
    * with the supported openCypher subset, so both languages share one
    * grammar here — the reference keeps two translators for the same IR
    * (gql_translator.rs vs cypher_translator.rs); divergent clauses can fork
    * later without touching the IR or compiler.
    */
  def gql(query: String): DataFrame = cypher(query)

  /** Parameterized GQL (same binding path as [[cypher]]). */
  def gql(query: String, params: Map[String, Any]): DataFrame =
    cypher(query, params)

  /** Cypher update queries (CREATE/SET/DELETE/DETACH DELETE/MERGE/REMOVE
    * after an optional MATCH prefix) — returns the mutated graph (functional
    * semantics; reads in the same query see the input snapshot, matching the
    * reference's MVCC view).
    */
  def cypherUpdate(query: String): graft.graph.PropertyGraph =
    graft.frontends.cypher.CypherUpdates.run(spark, graph, query)

  /** Gremlin entry point (reference processor.rs:282-291). */
  def gremlin(query: String): DataFrame =
    compiler.compile(graft.frontends.gremlin.GremlinFrontend.translate(query))

  /** GraphQL entry point (reference graphql_translator.rs). */
  def graphql(query: String): DataFrame =
    compiler.compile(graft.frontends.graphql.GraphQLFrontend.translate(query))
}
