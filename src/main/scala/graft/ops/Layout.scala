package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Physical-layout levers for 100 TB operation: bucketing (shuffle-free
 * co-located joins) and salting (skew spreading). Neither changes query
 * semantics — PlanAuditSpec proves the plan shape, result-equality specs
 * prove the semantics.
 */
object Layout {

  /**
   * Write both sides bucketed by the join key into the session catalog.
   * A subsequent equi-join on `key` between the two bucketed tables needs
   * NO Exchange: partitioning is established at write time, which is the
   * Spark-native version of the reference keeping records key-clustered in
   * page ranges. At 100 TB this converts the nightly fact-fact join from
   * two full shuffles into a zip of pre-sorted buckets.
   */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key (shuffle-free when both
    * were written with the same bucket count). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /**
   * Skew-spreading join: fact rows salt into `nSalts` sub-keys using a
   * row-varying deterministic expression; the (small) dim side replicates
   * per salt. A hot key's rows land on nSalts partitions instead of one.
   * AQE's skew-join handles moderate skew adaptively; explicit salting is
   * for the pathological keys AQE cannot split (single-key aggregations,
   * stateful streaming partitions).
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: Column, nSalts: Int): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(saltBy), lit(nSalts.toLong)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
