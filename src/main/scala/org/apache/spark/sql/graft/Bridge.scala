package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge. Spark 4 made these conversions
 * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); custom
 * Catalyst expressions still need them to expose a Column API, so this
 * one-file package-placement shim re-exports the two conversions for
 * graft.functions. No Spark internals are reimplemented here.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
