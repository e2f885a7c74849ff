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

  /** Scratch dirs awaiting JVM-exit cleanup: ONE shutdown hook drains this
    * registry — a hook per dir would accumulate unboundedly in long
    * bench/test JVMs that create many fixtures (csv/jsonl/zorder caches
    * per sf dir). */
  private val scratchDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private lazy val cleanupHook: Unit = {
    sys.addShutdownHook {
      scratchDirs.forEach { dir =>
        // best-effort throughout: the dir may already be gone, and a
        // throwing hook would abort cleanup of everything after it
        try {
          val s = java.nio.file.Files.walk(dir)
          try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .iterator().forEachRemaining(p =>
              try java.nio.file.Files.deleteIfExists(p) catch { case _: Exception => () })
          finally s.close()
        } catch { case _: Exception => () }
      }
    }
    ()
  }

  /** Create a temp scratch directory that is deleted recursively on JVM
    * exit. Roundtrip/layout fixtures hold full corpus copies — without
    * the cleanup every test/bench JVM leaks one per run (at the 100× SF
    * the JSONL copy alone is the whole corpus text). */
  def scratchDir(prefix: String): String = {
    cleanupHook // register the single hook on first use
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(dir)
    dir.toString
  }

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
}
