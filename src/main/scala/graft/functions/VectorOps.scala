package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order functions so everything stays inside whole-stage codegen
  * (no UDF boundary, no serialization).
  *
  * Determinism contract: elements are cast to double before multiplying
  * and the fold accumulates sequentially left-to-right — the same order
  * DuckDB's `list_dot_product(CAST(x AS DOUBLE[]), …)` uses — so scores
  * are bit-identical across engines (verified empirically, see
  * tools/check.py runs).
  */
object VectorOps {

  /** Sequential-fold dot product of two float-array columns, in double. */
  def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0 as double), (acc, v) -> acc + v)"

  /** L2 norm of a float-array column. */
  def normExpr(a: String): String = s"sqrt(${dotExpr(a, a)})"

  def dot(a: String, b: String): Column = expr(dotExpr(a, b))
  def norm(a: String): Column = expr(normExpr(a))

  /** Cosine from a precomputed dot and per-side norms (norms should be
    * computed once per vector, not per pair). */
  def cosine(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)

  /** DuckDB oracle fragments with the identical evaluation order. */
  def duckDot(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"
  def duckNorm(a: String): String = s"sqrt(${duckDot(a, a)})"
}
