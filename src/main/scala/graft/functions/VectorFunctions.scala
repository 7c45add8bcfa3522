package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance functions (SURVEY §2.4; reference eval_function
  * filter.rs:994-1050 with SIMD kernels in index/vector/simd.rs).
  *
  * Built from Spark's higher-order functions (`zip_with` + `aggregate`) so
  * they stay inside whole-stage codegen — no UDF serialization, no Python.
  * All math in double precision regardless of the input element type (the
  * embeddings tables store float32), matching the DuckDB oracle's
  * CAST(… AS DOUBLE[]) semantics.
  */
object VectorFunctions {
  import VectorExpressions.{vecDot, vecL1, vecL2Sq}

  /** Σ aᵢ·bᵢ — left-to-right accumulation in double (native codegen loop,
    * see VectorExpressions).
    */
  def dotProduct(a: Column, b: Column): Column = vecDot(a, b)

  def norm(a: Column): Column = sqrt(vecDot(a, a))

  def cosineSimilarity(a: Column, b: Column): Column =
    vecDot(a, b) / (norm(a) * norm(b))

  def euclideanDistance(a: Column, b: Column): Column = sqrt(vecL2Sq(a, b))

  def manhattanDistance(a: Column, b: Column): Column = vecL1(a, b)
}
