package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/**
 * Order-independent aggregates over doubles.
 *
 * Floating-point SUM is not associative, so a distributed sum of doubles is
 * nondeterministic across partitionings and never hash-matches a single-node
 * oracle. Money-like columns are summed as DECIMAL(18,2) (exact, associative)
 * and only converted back to double at the end — both Spark and DuckDB then
 * produce bit-identical results.
 */
object Exact {
  private val Money = DecimalType(18, 2)

  /** Exact sum of a 2-decimal-place double column, returned as double. */
  def sumMoney(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact average: (exact decimal sum as double) / count — one IEEE division. */
  def avgMoney(c: Column): Column = sumMoney(c) / count(c)
}
