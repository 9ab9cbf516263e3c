package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * The default path is the native codegen'd [[DotProductFloat]]
  * expression (one fused loop, no per-row allocation). The higher-order-
  * function form is kept as `dotHof` — it is the readable reference
  * implementation, and ScalaTest pins both to the same bits.
  *
  * Determinism contract: elements are cast to double before multiplying
  * and accumulation is sequential left-to-right — the same order DuckDB's
  * `list_dot_product(CAST(x AS DOUBLE[]), …)` uses — so scores are
  * bit-identical across engines (verified empirically via tools/check.py).
  */
object VectorOps {

  /** Native codegen dot product of two float-array columns, in double. */
  def dot(a: String, b: String): Column =
    GraftBridge.column(DotProductFloat(
      GraftBridge.expression(col(a)), GraftBridge.expression(col(b))))

  /** L2 norm of a float-array column (native path). */
  def norm(a: String): Column = sqrt(dot(a, a))

  /** Reference HOF implementation: sequential fold over zip_with. */
  def dotHofExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0 as double), (acc, v) -> acc + v)"

  def dotHof(a: String, b: String): Column = expr(dotHofExpr(a, b))

  /** Cosine from a precomputed dot and per-side norms (norms should be
    * computed once per vector, not per pair). */
  def cosine(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)

  /** DuckDB oracle fragments with the identical evaluation order. */
  def duckDot(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"
  def duckNorm(a: String): String = s"sqrt(${duckDot(a, a)})"
}
