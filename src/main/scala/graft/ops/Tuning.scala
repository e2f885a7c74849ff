package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Size-aware shuffle-width tuning for data-proportional shuffles.
 *
 * A fixed `spark.sql.shuffle.partitions` cannot serve both ends of the
 * scale brief: wide enough for 100 TB means thousands of empty partitions
 * at test SF; narrow enough for test SF means each reducer at 100 TB holds
 * GBs and spills. Spark's own answer is AQE partition coalescing — start
 * the shuffle WIDE (`initialPartitionNum`), let AQE merge small outputs
 * back to `advisoryPartitionSizeInBytes` — but the initial width is a
 * session conf, and raising it globally taxes every tiny query with extra
 * task scheduling (measured: +12% steady total across the 91-query surface
 * at sf0.1 for a blanket 256).
 *
 * [[scaledSession]] scopes the width to the queries that need it, sized by
 * what they actually shuffle: the on-disk bytes of the fact tables, one
 * initial partition per `bytesPerPartition`. The default is 32 MB of
 * PARQUET per initial partition, not AQE's 64 MB advisory size: parquet's
 * columnar encoding + zstd is ~2× denser than the row-format lz4 shuffle
 * blocks the reducers actually hold, so 32 MB of input approximates one
 * 64 MB advisory shuffle partition (measured on q5: 196 initial partitions
 * from a 64 MB divisor still brushed the spill threshold; 256+ did not).
 * Over-width is cheap — AQE coalesces small outputs back to the advisory
 * size — while under-width spills, so the divisor errs wide. Below the
 * session's configured width it returns the
 * caller's session UNCHANGED — zero cost, zero conf mutation at test SF.
 * Above it, queries build on a cloned session (same SparkContext, same
 * extensions — the [[graft.streaming.StreamOps]] drain pattern) so a
 * concurrent query on the caller's session observes nothing.
 *
 * Measured (scale/sf100, 1000× documents+TPC-H): `q5_join_multi` — whole
 * lineitem×orders×customer shuffle — 167.3s → 41.9s steady; the 32-wide
 * reducers spilled ~2 GB each, 256-wide fit in memory. On a real cluster
 * the same arithmetic yields the width the executor count can absorb.
 */
object Tuning {
  /** Clones keyed by parent session → width: one clone per distinct width,
    * reused across queries and bench iterations. The outer map holds the
    * parent session WEAKLY so a long-lived service that creates and drops
    * sessions cannot accumulate clones forever — a clone's lifetime is its
    * parent's (newSession() shares the context/sharedState but keeps no
    * reference to the parent, so the value never pins its own key). The
    * inner per-parent map is bounded by the handful of distinct widths the
    * byte-based sizing can produce. */
  private val scaled = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[Int, SparkSession]]())

  /** Total on-disk bytes of `<sfDir>/<table>.parquet` (file or directory),
    * through the path's own Hadoop FileSystem — works on file:/hdfs:/s3a:
    * like the rest of the warehouse (core/Catalog.scala r5). Missing table
    * → 0 (callers size on the tables they shuffle; absence means tiny). */
  def tableBytes(spark: SparkSession, sfDir: String, table: String): Long = {
    val p = new Path(s"$sfDir/$table.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /**
   * Session to build a shuffle-heavy query on, its AQE initial shuffle
   * width scaled to the named tables' bytes. Same session back when the
   * data is small enough for the configured width (the common test-SF
   * case); a conf-scoped clone when it is not.
   */
  def scaledSession(spark: SparkSession, sfDir: String, tables: Seq[String],
                    bytesPerPartition: Long = 32L << 20,
                    maxPartitions: Int = 1024): SparkSession = {
    require(bytesPerPartition > 0, s"bytesPerPartition must be > 0, got $bytesPerPartition")
    val base = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val want = tables.map(tableBytes(spark, sfDir, _)).sum / bytesPerPartition
    val width = math.min(maxPartitions.toLong, want).toInt
    if (width <= base) spark
    else scaled
      .computeIfAbsent(spark, _ => new ConcurrentHashMap[Int, SparkSession]())
      .computeIfAbsent(width, _ => {
        val clone = spark.newSession()
        clone.conf.set(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum", width.toString)
        clone
      })
  }
}
