package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for the engine's native expressions.
  *
  * Spark 4 moved `Column` behind ColumnNode and scoped the converters
  * `private[sql]`; extension libraries shipping custom Catalyst
  * expressions use a one-file shim in an `org.apache.spark.sql`
  * subpackage to reach them (same pattern the registry-injection API
  * uses internally). Only these two calls live here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
