package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion — the
  * standard pattern for Spark extension libraries (cf. public projects
  * like Qbeast/Sedona exposing package-private factories the same way).
  * Keeps the rest of the codebase in the `graft` package. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
