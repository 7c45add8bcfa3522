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
}
