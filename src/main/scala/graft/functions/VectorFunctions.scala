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

  private def toD(c: Column): Column = transform(c, _.cast("double"))

  /** Σ aᵢ·bᵢ — left-to-right accumulation in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(toD(a), toD(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dotProduct(a, a))

  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (norm(a) * norm(b))

  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toD(a), toD(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _))

  def manhattanDistance(a: Column, b: Column): Column =
    aggregate(zip_with(toD(a), toD(b), (x, y) => abs(x - y)), lit(0.0), _ + _)
}
