package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for the engine's custom Catalyst
  * expressions.
  *
  * Spark 4's classic Column API scopes the Expression conversions
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * a library that ships its own expressions either registers every one
  * in the session FunctionRegistry and hopes callers installed the
  * extension, or provides this one-file shim in a `sql` subpackage —
  * the standard extension-library escape hatch. Only the two
  * conversions are exposed; nothing else internal leaks.
  */
object bridge {
  /** Wrap an expression builder as a Column function. */
  def columnFn(f: Seq[Expression] => Expression)(cols: Column*): Column =
    ExpressionUtils.column(f(cols.map(ExpressionUtils.expression)))
}
