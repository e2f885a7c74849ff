package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Text source/sink roundtrips: CSV (the reference's own durability format —
 * its Database persists whole tables as CSV, lstore/table.py `to_csv`) and
 * JSON-lines (the de-facto training-data interchange format).
 *
 * Both writes stay distributed (one part file per task — never a
 * coalesce(1) driver funnel) and both reads carry an EXPLICIT schema:
 * schema inference is a extra full scan of the data at 100 TB, and a
 * sampled inference can mis-type columns. Doubles round-trip exactly —
 * Spark writes the shortest decimal representation, which parses back to
 * the identical bit pattern.
 *
 * Scale: uncompressed text files are splittable, so the read-back
 * parallelizes like parquet; what text formats lose is column pruning and
 * predicate pushdown — the scan reads every byte — which is why these are
 * ingest/egress formats here, never the storage format ([[graft.core.Catalog]]
 * stores parquet).
 */
object TextSources {

  /** Scratch directory for a fixture warehouse or roundtrip dir,
    * resolved through [[graft.core.Scratch]] — the session's Hadoop FS,
    * never a `java.nio` driver-local path (which on a real cluster each
    * executor resolves to its OWN /tmp, so the read-back silently sees
    * partial data). Delete-on-exit is registered with the FS. */
  def scratchDir(spark: SparkSession, prefix: String): String =
    graft.core.Scratch.dir(spark, prefix).toString

  /** Write `df` as headered CSV under `dir`, read it back with df's schema. */
  def csvRoundtrip(spark: SparkSession, df: DataFrame, dir: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(dir)
    spark.read.schema(df.schema).option("header", "true").csv(dir)
  }

  /** Write `df` as JSON lines under `dir`, read it back with df's schema. */
  def jsonlRoundtrip(spark: SparkSession, df: DataFrame, dir: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).json(dir)
    spark.read.schema(df.schema).json(dir)
  }

  /** Write `df` as ORC under `dir`, read it back with df's schema — the
    * other columnar interchange format: ORC reads get the same
    * footer-stats row-group pruning and column projection the parquet
    * path does (Spark's native vectorized ORC reader). The explicit
    * schema keeps the cross-format contract identical: the file's own
    * footer schema never silently widens a column. */
  def orcRoundtrip(spark: SparkSession, df: DataFrame, dir: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).orc(dir)
    spark.read.schema(df.schema).orc(dir)
  }
}
