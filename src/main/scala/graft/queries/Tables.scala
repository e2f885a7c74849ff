package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Parquet readers for the driver's test tables. */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /**
   * Explicit schemas for the STREAMABLE fact tables. A production stream
   * source must never pay (an extra listing+footer pass per deploy) or
   * trust (a sampled mis-type poisons the checkpoint forever) schema
   * inference — [[graft.streaming.StreamOps.fileSource]] reads these.
   * `events.ts` is declared long: the session-wide
   * `spark.sql.legacy.parquet.nanosAsLong` rule reads the TIMESTAMP(NANOS)
   * column as nanos-since-epoch, and every query does integer nano
   * arithmetic on it (SURVEY §4).
   */
  val streamSchemas: Map[String, StructType] = Map(
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))))

  def streamSchemaOf(name: String): StructType =
    streamSchemas.getOrElse(name,
      throw new IllegalArgumentException(s"no declared stream schema for: $name"))
}
