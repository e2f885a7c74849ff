package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * The ONE scratch-directory allocator for the whole engine. Every
 * fixture warehouse, roundtrip dir, and streaming checkpoint resolves
 * through the session's Hadoop [[org.apache.hadoop.fs.FileSystem]] —
 * never `java.nio` — because a driver-local temp dir becomes a
 * `file:/tmp/...` sink on a real cluster, where every EXECUTOR writes
 * task output to its own machine's disk and the driver's read-back sees
 * only driver-local files (empty or partial results, silently). That
 * failure mode was found and fixed for streaming drains in round 5
 * ([[graft.streaming.StreamOps]]); round 8 unifies the remaining
 * `java.nio` scratch (TextSources fixtures) onto the same resolution.
 *
 * Root resolution: `spark.graft.scratchDir` conf when set (a production
 * deploy points it at the warehouse FS — s3a:/hdfs:), else
 * `hadoop.tmp.dir` qualified against the configured default FS (shared
 * on any real cluster; `file:/tmp/...` on local mode, where local IS
 * shared). Each allocation is registered for delete-on-exit with the
 * FS, so bounded harness runs clean up after themselves — at the 100×
 * SF a leaked JSONL roundtrip copy alone is the whole corpus text.
 */
object Scratch {

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Allocate a fresh scratch directory under the resolved root. The
    * returned path is fully qualified (carries its FS scheme), so
    * downstream reads/writes through ANY session resolve to the same
    * filesystem — the `file:`-scheme case is driven explicitly in
    * ScratchSpec. */
  def dir(spark: SparkSession, prefix: String): Path = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(
      spark.conf.getOption("spark.graft.scratchDir").getOrElse(
        hconf.get("hadoop.tmp.dir", "/tmp") + "/graft-scratch"))
    val fs = root.getFileSystem(hconf)
    val d = new Path(fs.makeQualified(root),
      s"$prefix${seq.incrementAndGet()}_${java.util.UUID.randomUUID()}")
    require(fs.mkdirs(d), s"cannot create scratch dir $d")
    fs.deleteOnExit(d)
    d
  }
}
