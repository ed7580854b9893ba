package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Column/Dataset <-> Catalyst bridge.
  *
  * Spark 4 made the converters (`classic.ExpressionUtils`,
  * `classic.Dataset.ofRows`) `private[sql]`, so a library defining its own
  * Catalyst `Expression` or `LogicalPlan` needs one file inside an
  * `org.apache.spark.sql` subpackage to lift them into the public
  * `Column`/`DataFrame` API — the standard pattern for Spark extension
  * libraries. This object is the ONLY code in the repo outside the
  * `graft` namespace, and it contains no logic: four delegating calls.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column to a plain Catalyst expression tree
    * (UnresolvedAttribute etc.). Unlike [[expression]], the result holds
    * no lazy `ColumnNodeExpression` wrapper — required when the
    * expression is embedded in a CUSTOM logical plan, where the Dataset
    * API's implicit conversion never runs (the wrapper is neither
    * serializable nor resolvable there). */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** The (un-analyzed) logical plan behind a DataFrame. */
  def plan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.logical

  /** Wrap a logical plan back into the public DataFrame API. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
