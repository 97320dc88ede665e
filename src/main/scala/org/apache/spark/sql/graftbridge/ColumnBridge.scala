package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for the classic (non-Connect) runtime.
  *
  * Spark 4 moved `Column` to a backend-agnostic ColumnNode representation
  * and made the conversion helpers `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). A library that
  * registers Catalyst expressions in the FunctionRegistry but builds its
  * user-facing API out of Column combinators needs both directions; this
  * one-object shim lives in a subpackage of `org.apache.spark.sql` purely
  * to satisfy that access qualifier (the standard ecosystem workaround —
  * no Spark internals are re-implemented here).
  */
object ColumnBridge {
  /** Catalyst expression behind a classic-session Column (lazy wrapper —
    * resolved when a classic Dataset operation converts the plan; NOT
    * suitable for splicing into mid-analysis trees). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to plain Catalyst expressions
    * (UnresolvedFunction / lambda nodes the analyzer itself resolves).
    * Required when the expression is injected where the classic
    * Dataset conversion never runs — e.g. a FunctionRegistry builder
    * expanding inside SQL analysis. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a Catalyst expression as a classic-session Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
