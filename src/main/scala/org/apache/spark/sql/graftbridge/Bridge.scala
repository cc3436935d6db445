package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into package-private Spark 4 internals: Column no longer
  * exposes a public Expression constructor; classic.ExpressionUtils.column
  * is the internal factory (pattern per SNIPPETS.md [1]/[3] — public
  * projects place a one-file shim in the spark namespace).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
