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
    * GQL core pattern surface shares the openCypher grammar and IR; the
    * GQL-specific statements (INSERT, CREATE VECTOR INDEX — reference
    * gql_translator.rs, gql/ast.rs:386) route through
    * graft.frontends.gql.GqlFrontend. DDL/DML here returns a summary or
    * throws toward the stateful entry points ([[gqlUpdate]],
    * [[createVectorIndex]]) — reads compile to a DataFrame as usual.
    */
  def gql(query: String): DataFrame =
    graft.frontends.gql.GqlFrontend.parseStatement(query) match {
      case graft.frontends.gql.GqlQuery(op) => compiler.compile(op)
      case _: graft.frontends.gql.GqlMutation =>
        throw new IllegalArgumentException(
          "INSERT/SET/DELETE run through gqlUpdate(), which returns the mutated graph")
      case _: graft.frontends.gql.GqlCreateVectorIndex =>
        throw new IllegalArgumentException(
          "CREATE VECTOR INDEX runs through createVectorIndex(query, vectors, idCol)")
    }

  /** Parameterized GQL (same binding path as [[cypher]]). */
  def gql(query: String, params: Map[String, Any]): DataFrame =
    cypher(query, params)

  /** GQL INSERT (and the shared SET/DELETE/MERGE surface) — functional
    * semantics like [[cypherUpdate]]: returns the mutated graph.
    */
  def gqlUpdate(query: String): PropertyGraph =
    graft.frontends.cypher.CypherUpdates.run(spark, graph, query)

  private val vectorIndexes =
    scala.collection.concurrent.TrieMap.empty[String, graft.frontends.gql.VectorIndexes.VectorIndex]

  /** `CREATE VECTOR INDEX name ON Label(prop) USING LSH|IVF [OPTIONS(…)]`
    * (reference gql/ast.rs:386): builds the LSH-bucket or IVF index over
    * `vectors` and registers it on this session; returns the one-row DDL
    * summary.
    */
  def createVectorIndex(query: String, vectors: DataFrame, idCol: String): DataFrame =
    graft.frontends.gql.GqlFrontend.parseStatement(query) match {
      case stmt: graft.frontends.gql.GqlCreateVectorIndex =>
        val idx = graft.frontends.gql.VectorIndexes.create(stmt, vectors, idCol)
        vectorIndexes(stmt.name) = idx
        idx.summary
      case _ => throw new IllegalArgumentException("not a CREATE VECTOR INDEX statement")
    }

  /** Look up an index registered by [[createVectorIndex]]. */
  def vectorIndex(name: String): Option[graft.frontends.gql.VectorIndexes.VectorIndex] =
    vectorIndexes.get(name)

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

  /** Gremlin mutation traversals (addV/addE/property/drop, reference
    * gremlin/ast.rs) — functional semantics: returns the mutated graph.
    */
  def gremlinUpdate(query: String): PropertyGraph =
    graft.frontends.gremlin.GremlinUpdates.run(spark, graph, query)

  /** GraphQL entry point (reference graphql_translator.rs). */
  def graphql(query: String): DataFrame = {
    if (query.trim.toLowerCase.startsWith("mutation"))
      throw new IllegalArgumentException(
        "mutation documents run through graphqlMutation(), which returns the mutated graph")
    compiler.compile(graft.frontends.graphql.GraphQLFrontend.translate(query))
  }

  /** GraphQL mutations (reference graphql_translator.rs:130) — functional
    * semantics: returns the mutated graph.
    */
  def graphqlMutation(query: String): graft.graph.PropertyGraph =
    graft.frontends.graphql.GraphQLMutations.run(spark, graph, query)
}
