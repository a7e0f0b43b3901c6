package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column opaque (ColumnNode-backed); the supported
  * bridge for libraries shipping native Catalyst expressions lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * private[sql] — so this accessor sits inside the sql package
  * namespace, the same pattern third-party Spark connectors use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
