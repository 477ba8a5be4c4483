package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column construction — the standard OSS
  * extension-library pattern (spark-daria, frameless, delta all ship a
  * file under `org.apache.spark.sql` for exactly this): it lets graft wrap
  * a custom catalyst [[Expression]] into a public [[Column]] without
  * routing through a session's function registry, so the custom operators
  * work on any session, registered or not.
  */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
