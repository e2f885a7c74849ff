package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Order-independent exact aggregates over money-like doubles.
 *
 * Floating-point SUM is not associative, so a distributed sum of doubles is
 * nondeterministic across partitionings and never hash-matches a single-node
 * oracle. A 2-decimal-place double is exactly representable as an integer
 * count of cents, so money sums run as LONG sums — exact, associative, and
 * whole-stage-codegen primitive arithmetic (the previous Decimal128
 * aggregation was exact too, but every row boxed a java.math.BigDecimal;
 * the long path measured ~2x faster on the q1 scan).
 *
 * Equivalence to the decimal path (and to the DuckDB oracle): the long sum
 * is the same rational number as the decimal sum, and both final steps —
 * `CAST(decimal AS DOUBLE)` and `long / 100.0` — are correctly rounded, so
 * they produce the identical double while the scaled sum stays below 2^53.
 * That is the same invariant the DOUBLE output columns already require
 * (SURVEY §4); the long accumulator itself is exact to 2^63 (~sf 10^4).
 */
object Exact {

  /** Exact scale-2 integer (cents) of a ≤2-decimal-place double column.
   *  x*100 lands within one ulp of the true integer; round() recovers it. */
  def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** Exact sum of a 2dp double column, returned as double. */
  def sumMoney(c: Column): Column = sum(cents(c)) / 100.0

  /** Exact average: (exact sum as double) / count — one IEEE division. */
  def avgMoney(c: Column): Column = sumMoney(c) / count(c)
}
