package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persistent warehouse of [[LineageTable]]s — the reference's Database
 * surface (reference: lstore/db.py — open/close, create_table/drop_table/
 * get_table, page persistence) re-expressed as a parquet warehouse:
 *
 *   warehouse/
 *     <table>/_graft.json       key column + data columns + schema
 *     <table>/base/             compacted base records (parquet)
 *     <table>/tail/             appended lineage since last compaction
 *
 * Writes go to the tail only (append-only, like the reference's tail
 * pages); `compact` folds tail into base exactly like the reference's
 * background merge (lstore/table.py:186) and truncates the tail. The
 * reference's bufferpool (pin/unpin/dirty/evict) maps onto Spark's block
 * manager — `LineageTable.persisted` pins, eviction is automatic.
 *
 * Concurrency model (replaces record-level 2PL, lstore/table.py:57):
 * single writer per table, atomic adopt-on-commit — a [[Txn]] builds the
 * next table state functionally and `save` makes it durable; readers always
 * see a consistent snapshot because parquet files are immutable.
 *
 * At 100 TB: base is written sorted by key (`sortWithinPartitions`) so
 * min-max row-group pruning serves point/range probes (the distributed
 * analog of the reference's per-column hash index); tail stays small
 * relative to base between compactions, so snapshot cost ≈ base scan cost.
 */
final class Catalog(spark: SparkSession, warehouse: String) {

  private def dir(table: String) = s"$warehouse/$table"
  private def metaPath(table: String) = Paths.get(dir(table), "_graft.json")

  def tableNames: Seq[String] = {
    val root = Paths.get(warehouse)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val s = Files.list(root)
      try s.iterator().asScala()
        .filter(p => Files.exists(p.resolve("_graft.json")))
        .map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
  }

  // Files.list gives a Java stream; tiny adapter to keep this file
  // dependency-free of scala-collection-compat.
  implicit private class JStream[T](it: java.util.Iterator[T]) {
    def asScala(): Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  /** Create a table from initial rows (reference: Database.create_table). */
  def createTable(name: String, keyCol: String,
                  rows: org.apache.spark.sql.DataFrame): LineageTable = {
    require(!Files.exists(metaPath(name)), s"table $name already exists")
    val t = LineageTable.fromBase(keyCol, rows)
    Files.createDirectories(Paths.get(dir(name)))
    writeMeta(name, keyCol, rows.columns.toSeq)
    t.lineage.write.mode(SaveMode.Overwrite)
      .parquet(s"${dir(name)}/base")
    getTable(name)
  }

  /** Load a table (reference: Database.get_table). Reading base ∪ tail
    * reconstructs exactly the state last saved. */
  def getTable(name: String): LineageTable = {
    val (keyCol, dataCols) = readMeta(name)
    val base = spark.read.parquet(s"${dir(name)}/base")
    val tailDir = Paths.get(dir(name), "tail")
    val lineage =
      if (Files.isDirectory(tailDir) && hasParquet(tailDir))
        base.unionByName(spark.read.parquet(tailDir.toString))
      else base
    LineageTable.fromPersisted(keyCol, dataCols, lineage)
  }

  /** Append new lineage rows to the table's tail (reference: tail-page
    * append). Rows must carry the lineage schema (_ver/_del included). */
  def appendTail(name: String, newRows: org.apache.spark.sql.DataFrame): Unit =
    newRows.write.mode(SaveMode.Append).parquet(s"${dir(name)}/tail")

  /** Apply a [[Txn]] to the stored table and make it durable: the new
    * lineage rows (and only those) are appended to the tail. All-or-
    * nothing — a failing op aborts before anything is written. */
  def commit(name: String, txn: Txn): LineageTable = {
    val before = getTable(name)
    val after = txn.commit(before)
    appendTail(name, after.lineage.exceptAll(before.lineage))
    getTable(name)
  }

  /** Persist a full table state: compacted base, empty tail (reference:
    * Table.__merge + Database.close persistence in one step). */
  def saveCompacted(name: String, t: LineageTable): Unit = {
    val staged = s"${dir(name)}/base_staged"
    t.compact.lineage
      .repartition(col(t.keyCol))
      .sortWithinPartitions(col(t.keyCol))
      .write.mode(SaveMode.Overwrite).parquet(staged)
    // swap: staged base replaces base, tail truncates — readers of the old
    // files are unaffected (immutable parquet), new readers see the merge.
    val baseDir = Paths.get(dir(name), "base")
    deleteRecursively(baseDir)
    Files.move(Paths.get(staged), baseDir)
    deleteRecursively(Paths.get(dir(name), "tail"))
  }

  /** Drop a table and its files (reference: Database.drop_table). */
  def dropTable(name: String): Unit = deleteRecursively(Paths.get(dir(name)))

  /** Catalog inventory: name, live-row count, column count. */
  def inventory(): org.apache.spark.sql.DataFrame =
    tableNames.map { n =>
      val t = getTable(n)
      t.snapshot.agg(count(lit(1)).as("n_rows"))
        .select(lit(n).as("tbl"), col("n_rows"),
          lit(t.dataCols.length).as("n_cols"))
    }.reduce(_ unionByName _)

  private def writeMeta(name: String, keyCol: String, cols: Seq[String]): Unit = {
    val json =
      s"""{"key": "$keyCol", "columns": [${cols.map("\"" + _ + "\"").mkString(", ")}]}"""
    Files.writeString(metaPath(name), json)
  }

  private def readMeta(name: String): (String, Seq[String]) = {
    require(Files.exists(metaPath(name)), s"no such table: $name")
    val json = Files.readString(metaPath(name))
    // metadata is written by writeMeta above — a flat two-field object.
    val key = "\"key\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(json).get.group(1)
    val cols = "\"columns\"\\s*:\\s*\\[([^\\]]*)\\]".r
      .findFirstMatchIn(json).get.group(1)
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
    (key, cols)
  }

  private def hasParquet(p: java.nio.file.Path): Boolean = {
    val s = Files.list(p)
    try s.iterator().asScala().exists(_.toString.endsWith(".parquet"))
    finally s.close()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala().foreach(Files.delete)
      finally s.close()
    }
}
