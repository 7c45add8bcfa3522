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

  /** Zero-norm guard: cos(a, 0) is defined as 0.0 (maximally dissimilar,
    * matching Hnsw.Index.dist's `d == 0 → distance 1.0`). Without it a
    * single all-zero embedding in the corpus throws DIVIDE_BY_ZERO under
    * Spark's default ANSI mode and fails the whole scoring job.
    */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(vecDot(a, b) / denom)
  }

  def euclideanDistance(a: Column, b: Column): Column = sqrt(vecL2Sq(a, b))

  def manhattanDistance(a: Column, b: Column): Column = vecL1(a, b)
}
