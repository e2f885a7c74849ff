package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Catalog, Txn}

/**
 * N-writer contention ledger (reference: lstore/transaction_worker.py:26
 * runs transaction batches on concurrent threads — there under 2PL record
 * locks, here under the Catalog's optimistic CAS + commit-marker
 * discipline). Measures what the race SPECS only assert: throughput and
 * abort/retry behavior when 8–16 writers hammer ONE table (every commit
 * CAS-contends) vs the same writers on DISJOINT tables (no logical
 * contention — the floor set by commit I/O itself).
 *
 * Each writer loops: read opSeq → build a disjoint-key update → tryCommit
 * → on ConcurrentModificationException re-read and retry with bounded
 * exponential backoff + jitter (the starvation guard: without backoff,
 * N-1 losers re-collide on the next CAS window and tail latency explodes
 * with N).
 *
 * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ContentionProbe
 * Prints one LEDGER line per scenario.
 */
object ContentionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-contention")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // FAIR keeps one writer's job from convoying the other 15 behind it
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("custkey"),
        col("o_totalprice").as("v"))
      .limit(20000).localCheckpoint()

    def scenario(writers: Int, commitsPer: Int, shared: Boolean): Unit = {
      val wh = graft.sources.TextSources.scratchDir(spark, "graft_cont_")
      val setup = new Catalog(spark, wh, autoCompact = false)
      val tables =
        if (shared) { setup.createTable("t", "k", base); Seq.fill(writers)("t") }
        else (0 until writers).map { i =>
          setup.createTable(s"t$i", "k", base); s"t$i"
        }
      val aborts = new AtomicLong(0)
      val maxRetries = new AtomicLong(0)
      val t0 = System.nanoTime()
      val threads = (0 until writers).map { w =>
        new Thread(() => {
          // one Catalog handle per writer: separate instances share no
          // JVM table lock, so contention is the real cross-process CAS
          val cat = new Catalog(spark, wh, autoCompact = false)
          val rnd = new java.util.Random(w)
          val tbl = tables(w)
          for (c <- 0 until commitsPer) {
            var done = false
            var tries = 0
            while (!done) {
              val seq = cat.getTable(tbl).currentVersion
              val txn = Txn.empty.update(
                col("k") % writers === w && col("k") % 7 === c % 7,
                Map("v" -> (col("v") + lit(1.0))))
              cat.tryCommit(tbl, txn, seq) match {
                case Right(_) => done = true
                case Left(_: java.util.ConcurrentModificationException) =>
                  aborts.incrementAndGet(); tries += 1
                  require(tries < 200, s"writer $w starved at commit $c")
                  // backoff tuned to the COMMIT critical section (~0.5s
                  // of real parquet work at this fixture): a 200ms cap
                  // made losers re-collide 2-3× per window (measured
                  // 2861 aborts / 64 commits at 16 writers); ramping to
                  // a ~1s cap with full jitter spreads re-attempts
                  // across whole commit windows
                  Thread.sleep(rnd.nextInt(math.min(1000,
                    100 * (1 << math.min(tries, 4))) + 1).toLong + 25L)
                case Left(e) => throw e
              }
            }
            maxRetries.getAndUpdate(m => math.max(m, tries))
          }
        }, s"writer-$w")
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val total = writers * commitsPer
      // every commit landed exactly once: op_seq advanced total times on
      // the shared table (or commitsPer per disjoint table)
      val check = new Catalog(spark, wh, autoCompact = false)
      val opSeqs = tables.distinct.map(t => check.getTable(t).currentVersion).toList
      val expected = if (shared) List(total.toLong)
        else List.fill(writers)(commitsPer.toLong)
      require(opSeqs.sorted == expected.sorted,
        s"lost/duplicated commits: opSeqs=$opSeqs expected=$expected")
      println(f"""LEDGER {"scenario":"${if (shared) "shared" else "disjoint"}","writers":$writers,"commits":$total,"aborts":${aborts.get()},"max_retries_one_commit":${maxRetries.get()},"wall_sec":$wall%.1f,"commits_per_sec":${total / wall}%.2f}""")
    }

    for (w <- Seq(8, 16)) {
      scenario(w, commitsPer = 4, shared = false)
      scenario(w, commitsPer = 4, shared = true)
    }
    spark.stop()
  }
}
