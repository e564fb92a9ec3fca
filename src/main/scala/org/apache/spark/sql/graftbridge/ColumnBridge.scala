package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionUtils => EU}

/** Public bridge over Spark 4's `private[sql]` Column ↔ Expression
  * conversions, so our custom Catalyst expressions in `graft.functions`
  * can be used through the public `Column` API. */
object ColumnBridge {
  def column(e: Expression): Column = EU.column(e)
  def expression(c: Column): Expression = EU.expression(c)
}
