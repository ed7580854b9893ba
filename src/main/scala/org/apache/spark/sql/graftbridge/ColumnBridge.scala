package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge.
  *
  * Spark 4 made the converters (`classic.ExpressionUtils`) `private[sql]`,
  * so a library defining its own Catalyst `Expression` needs one file
  * inside an `org.apache.spark.sql` subpackage to lift expressions into
  * the public `Column` API — the standard pattern for Spark extension
  * libraries. This object is the ONLY code in the repo outside the
  * `graft` namespace, and it contains no logic: two delegating calls.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
