package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 made `Column` a thin wrapper over `ColumnNode`
  * and scoped the Expression<->Column converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so this one-file
  * subpackage of `org.apache.spark.sql` re-exports exactly the two
  * conversions the engine needs. No Spark internals are modified.
  */
object ColumnGlue {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst expression tree. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
