package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** COPY INTO (r14, [[Catalog.copyInto]]): idempotent file-granularity
  * bulk ingest — each file's rows land exactly once across any number
  * of calls; the loaded-file manifest commits WITH the data at one
  * commitMulti point (both-or-neither is that protocol's property,
  * raced and crash-tested in its own specs). */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs() = (
    Files.createTempDirectory("graft_cpi_wh_").toString,
    Files.createTempDirectory("graft_cpi_land_").toString)

  test("new files load once; re-runs and already-known files are no-ops") {
    val (wh, land) = freshDirs()
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    Seq((10L, "x"), (11L, "y")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$land/p1")
    assert(cat.copyInto("t", s"$land/p1") >= 1L)
    assert(cat.getTable("t").snapshot.count() === 4L)
    // identical re-run: nothing loads, nothing changes
    assert(cat.copyInto("t", s"$land/p1") === 0L)
    assert(cat.getTable("t").snapshot.count() === 4L)
    // a second drop arrives; scanning the WHOLE landing dir loads only it
    Seq((12L, "z")).toDF("k", "v").coalesce(1).write.parquet(s"$land/p2")
    assert(cat.copyInto("t", s"$land/*") >= 1L)
    val got = cat.getTable("t").snapshot.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "a"), (2L, "b"), (10L, "x"), (11L, "y"),
      (12L, "z")))
    // and the manifest is a real queryable table in the catalog
    assert(cat.tableNames.contains("t__copyfiles"))
    assert(cat.getTable("t__copyfiles").snapshot.count() ===
      spark.read.parquet(s"$land/p1", s"$land/p2").inputFiles.length)
  }

  test("columns align by NAME with casts; CSV format; empty glob = 0") {
    val (wh, land) = freshDirs()
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k", Seq((1L, 1.5)).toDF("k", "v"))
    // source column ORDER differs and types are narrower — the load
    // selects by name and casts to the table's schema
    Seq((2.5f, 20), (3.5f, 30)).toDF("v", "k")
      .coalesce(1).write.option("header", "true").csv(s"$land/c1")
    assert(cat.copyInto("t", s"$land/c1", "csv",
      Map("header" -> "true", "inferSchema" -> "true")) >= 1L)
    val got = cat.getTable("t").snapshot.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((1L, 1.5), (20L, 2.5), (30L, 3.5)))
    assert(cat.copyInto("t", s"$land/nothing_here*") === 0L)
  }

  test("a fresh handle resumes the manifest: exactly-once across sessions") {
    val (wh, land) = freshDirs()
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k", Seq((1L, "a")).toDF("k", "v"))
    Seq((2L, "b")).toDF("k", "v").coalesce(1).write.parquet(s"$land/p1")
    cat.copyInto("t", s"$land/p1")
    // a new session over the same warehouse skips the recorded files
    val cat2 = new Catalog(spark, wh, autoCompact = false)
    assert(cat2.copyInto("t", s"$land/p1") === 0L)
    assert(cat2.getTable("t").snapshot.count() === 2L)
  }
}
