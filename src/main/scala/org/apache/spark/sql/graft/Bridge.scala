package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge. Spark 4 made these conversions
 * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); custom
 * Catalyst expressions still need them to expose a Column API, so this
 * one-file package-placement shim re-exports the conversions for
 * graft.functions — plus the parser and plan-to-DataFrame hooks the SQL
 * DML front door ([[graft.sql.GraftSql]]) needs. No Spark internals are
 * reimplemented here.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Parse one SQL statement with the session's OWN parser (ANSI SQL via
    * Spark's grammar — DML statements parse into catalyst command plans
    * even when the target is not a V2 catalog table, which is exactly
    * the hook the graft DML front door pattern-matches). */
  def parsePlan(spark: SparkSession, sqlText: String): LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parsePlan(sqlText)

  /** Parse one SQL expression (a predicate/value, not a statement) with
    * the session parser — how `CALL graft.purge('t', '<predicate>')`
    * turns its predicate-text argument into an engine Column. */
  def parseExpression(spark: SparkSession, sqlText: String): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parseExpression(sqlText)

  /** The analyzed logical plan behind a DataFrame — how the front door
    * splices an engine-built relation (a versioned snapshot) into a
    * parsed statement's tree before analysis. */
  def planOf(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Analyze + wrap an (unresolved) logical plan as a DataFrame — how
    * the front door turns a parsed DML statement's SOURCE subtree
    * (a `USING (subquery)`, an `INSERT ... SELECT` body, a `VALUES`
    * list) into the engine's input relation. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
