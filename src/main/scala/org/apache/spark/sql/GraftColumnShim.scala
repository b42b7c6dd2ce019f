package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's Catalyst expressions and the public Column
  * API. Spark 4 made `Column` a backend-neutral wrapper over a
  * `ColumnNode`, so a library can no longer write `new Column(expr)`;
  * the sanctioned classic-backend converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — hence this one-file shim inside the sql package.
  *
  * Why not `functions.call_function(name, ...)` everywhere: that
  * resolves the name through the session's FunctionRegistry at
  * analysis, which makes every graft Column wrapper silently depend on
  * [[graft.GraftExtensions]] being installed — a library entry point
  * like `Sketches.portableEstimate` would fail with "undefined
  * function" in a vanilla session. Building the Column from the
  * expression directly removes the registration dependency; the SQL
  * registrations remain for `spark.sql("... ieee_ln(x) ...")` users.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
