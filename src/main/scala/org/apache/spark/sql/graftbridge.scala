package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters, so
  * graft's custom Catalyst expressions (graft.functions) can surface as
  * ordinary `Column`s. This is the conventional extension-library shim for
  * Spark 4's column-node API; nothing else in the repo lives outside the
  * `graft` namespace.
  */
object graftbridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
