package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ExpressionUtils => EU}

/** Public bridge over Spark 4's `private[sql]` Column ↔ Expression
  * conversions, so our custom Catalyst expressions in `graft.functions`
  * can be used through the public `Column` API. */
object ColumnBridge {
  def column(e: Expression): Column = EU.column(e)
  def expression(c: Column): Expression = EU.expression(c)

  /** The analyzed logical plan of a Dataset — for embedding a DataFrame
    * as a subquery expression (e.g. a scalar-subquery bloom filter). */
  def analyzedPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** A DataFrame over an arbitrary logical plan — the `Dataset.ofRows`
    * private[sql] constructor, needed to hand a custom LogicalPlan node
    * (e.g. graft.plans.AsofJoin) back to the public API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
