package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made `Column` implementation-agnostic (it wraps a `ColumnNode`, not
  * an `Expression`); the converters live in `org.apache.spark.sql.classic` and
  * are `private[sql]`, so this one-file shim inside the `org.apache.spark.sql`
  * package is the supported-by-convention way for libraries to lift their own
  * expressions into the public `Column` algebra.
  */
object ColumnBridge {
  def apply(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
