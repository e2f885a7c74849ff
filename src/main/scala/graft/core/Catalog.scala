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
 *     <table>/_graft.json       key column, data columns, index, op_seq
 *     <table>/base/             compacted base records (parquet)
 *     <table>/tail/             appended lineage since last compaction
 *
 * Writes go to the tail only (append-only, like the reference's tail
 * pages); `compact` folds tail into base exactly like the reference's
 * background merge (lstore/table.py:186) and truncates the tail. The
 * reference's bufferpool (pin/unpin/dirty/evict) maps onto Spark's block
 * manager — `LineageTable.persisted` pins, eviction is automatic.
 *
 * Commit durability is DELTA-native: each [[LineageTable]] op constructs
 * exactly its appended rows and the table accumulates them in `delta`, so
 * `commit` writes that delta and nothing else — the reference's tail-page
 * append. (No diff of full lineages: an r1 `exceptAll` cost a two-sided
 * shuffle of the whole table per commit.)
 *
 * Index lifecycle (reference: lstore/index.py:59,66 create_index/
 * drop_index): an "index" here is a physical re-layout of the base —
 * range-partitioned and sorted by the indexed column, recorded in
 * `_graft.json` — so parquet file- and row-group-level min-max pruning
 * serves secondary-column probes the way the reference's per-column hash
 * index serves `locate`. Distributed, no side structure to maintain;
 * compaction preserves the layout.
 *
 * Concurrency model (replaces record-level 2PL, lstore/table.py:57):
 * single writer per table, atomic adopt-on-commit — a [[Txn]] builds the
 * next table state functionally and `commit` makes it durable; readers
 * always see a consistent snapshot because parquet files are immutable.
 * Cross-TABLE parallelism is free under this discipline: [[Txn.runBatches]]
 * drives independent tables' batches concurrently.
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
    writeMeta(name, Meta(keyCol, rows.columns.toSeq, index = None, opSeq = 0))
    t.lineage.write.mode(SaveMode.Overwrite)
      .parquet(s"${dir(name)}/base")
    getTable(name)
  }

  /** Load a table (reference: Database.get_table). Reading base ∪ tail
    * reconstructs exactly the state last saved. */
  def getTable(name: String): LineageTable = {
    val meta = readMeta(name)
    val base = spark.read.parquet(baseDir(name).toString)
    val tailDir = Paths.get(dir(name), "tail")
    val hasTail = Files.isDirectory(tailDir) && hasParquet(tailDir)
    val lineage =
      if (hasTail) base.unionByName(spark.read.parquet(tailDir.toString))
      else base
    // With no tail AND a single-version base (multiVer records when a
    // vacuum left retained history in the base), every record has exactly
    // one live version: snapshot ≡ base scan (no window/shuffle) — the
    // property that makes an indexed layout answer secondary probes by
    // pruning alone.
    LineageTable.fromPersisted(meta.key, meta.columns, lineage, meta.opSeq,
      tailEmpty = !hasTail && !meta.multiVer)
  }

  /** Recover-aware base dir: if a crash interrupted [[saveCompacted]]
    * between retiring the old base and adopting the staged one, the data
    * is intact under base_old — fall back to it. */
  private def baseDir(name: String): java.nio.file.Path = {
    val base = Paths.get(dir(name), "base")
    val old = Paths.get(dir(name), "base_old")
    if (Files.isDirectory(base)) base
    else if (Files.isDirectory(old)) old
    else { require(Files.exists(metaPath(name)), s"no such table: $name"); base }
  }

  /** Append new lineage rows to the table's tail (reference: tail-page
    * append). Rows must carry the lineage schema (_ver/_del included). */
  def appendTail(name: String, newRows: org.apache.spark.sql.DataFrame): Unit =
    newRows.write.mode(SaveMode.Append).parquet(s"${dir(name)}/tail")

  /** Apply a [[Txn]] to the stored table and make it durable: the rows the
    * ops appended — and ONLY those — are written to the tail (the delta
    * accumulated by the ops themselves; nothing is recomputed by diffing).
    * All-or-nothing — a failing op aborts before anything is written. */
  def commit(name: String, txn: Txn): LineageTable = {
    val before = getTable(name)
    val after = txn.commit(before)
    // meta BEFORE rows: a crash between the two leaves op_seq advanced
    // past the (absent) rows, so the next commit stamps a fresh _ver — a
    // harmless gap. The reverse order would let a crash replay a _ver
    // stamp onto different rows, making snapshot row_number ties
    // nondeterministic forever.
    writeMeta(name, readMeta(name).copy(opSeq = after.opSeq))
    after.delta.foreach(appendTail(name, _))
    getTable(name)
  }

  /** Persist a full table state: compacted base, empty tail (reference:
    * Table.__merge + Database.close persistence in one step). The base is
    * range-partitioned + sorted by the indexed column (or the key), so
    * min-max pruning serves probes on that column. The swap is
    * crash-tolerant: base retires to base_old before the staged base is
    * adopted, and [[getTable]] falls back to base_old if a crash lands
    * between the two renames. */
  def saveCompacted(name: String, t: LineageTable): Unit = {
    val meta = readMeta(name)
    val layoutCol = meta.index.getOrElse(t.keyCol)
    val staged = s"${dir(name)}/base_staged"
    // stage FIRST: `t` may have been read through the baseDir fallback
    // (base missing, base_old live after an interrupted swap), so its
    // plan references whichever directory exists — nothing may be moved
    // or deleted until the new state is fully written out.
    t.compact.lineage
      .repartitionByRange(col(layoutCol))
      .sortWithinPartitions(col(layoutCol))
      .write.mode(SaveMode.Overwrite).parquet(staged)
    swapBase(name)
    deleteRecursively(Paths.get(dir(name), "tail"))
    writeMeta(name, meta.copy(opSeq = 0, multiVer = false))
  }

  /** Crash-tolerant base adoption shared by [[saveCompacted]] and
    * [[vacuum]]: retire base to base_old, adopt base_staged, clean up —
    * with [[baseDir]]'s base_old fallback covering a crash between the two
    * renames. ONE audited implementation; staging must be complete before
    * calling. */
  private def swapBase(name: String): Unit = {
    val staged = Paths.get(dir(name), "base_staged")
    val base = Paths.get(dir(name), "base")
    val old = Paths.get(dir(name), "base_old")
    if (Files.isDirectory(base)) {
      deleteRecursively(old)
      Files.move(base, old)   // retire (data still readable via fallback)
      Files.move(staged, base) // adopt
      deleteRecursively(old)
    } else {
      // recovering from a crash between the two renames: base_old (or
      // nothing, for a table created empty) holds the prior data and the
      // staged dir is already the complete next state — adopt directly
      Files.move(staged, base)
      deleteRecursively(old)
    }
  }

  /**
   * The reference's periodic background merge trigger (lstore/table.py:186
   * folds tail pages into base when updates accumulate): compact when the
   * tail has grown past `maxTailRatio` of the base. Row counts are
   * metadata-only (parquet footer statistics — `count()` on a bare scan
   * never reads column data), so the check is cheap enough to run after
   * every commit; a production deployment would run it on a schedule
   * exactly like the reference's background thread. Returns true when a
   * compaction ran.
   */
  def maybeCompact(name: String, maxTailRatio: Double = 0.3): Boolean = {
    val tailPath = Paths.get(dir(name), "tail")
    if (!Files.isDirectory(tailPath) || !hasParquet(tailPath)) return false
    val baseRows = spark.read.parquet(baseDir(name).toString).count()
    val tailRows = spark.read.parquet(tailPath.toString).count()
    val due = baseRows == 0 || tailRows.toDouble / baseRows > maxTailRatio
    if (due) saveCompacted(name, getTable(name))
    due
  }

  /**
   * Persist a retention vacuum (see [[LineageTable.vacuum]]): physically
   * drop superseded versions beyond the newest `keep` per key (and
   * fully-dead lone tombstones).
   *
   * Crash tolerance comes from STRICT SHADOWING, the same property that
   * protects [[saveCompacted]]: the retained rows are re-stamped with
   * fresh versions ABOVE every existing stamp (rank r of a key gets
   * `op_seq + keep + 1 - r`, preserving per-key order), the whole
   * retained set becomes the new base via the shared staged swap, and
   * the tail is deleted last. At every crash point the readable state is
   * consistent: before the swap nothing changed; after the swap a
   * leftover tail's rows rank strictly BELOW the re-stamped base rows
   * (no (key, _ver) ties — preserving raw stamps here was a bug: a crash
   * before tail deletion would have produced duplicate ranks and
   * corrupted version reads), so a snapshot is correct and version reads
   * transiently see pre-vacuum history until the next vacuum/compaction
   * reclaims it. Metadata (op_seq advanced by `keep`, multi_ver flag)
   * writes BEFORE the swap — commit's rule: a crash leaves a harmless
   * version gap, never a reused stamp. The multi_ver flag keeps
   * [[getTable]]'s empty-tail fast path and [[inventory]]'s footer path
   * truthful when keep>1 leaves multi-version history in the base.
   */
  def vacuum(name: String, keep: Int = 1): LineageTable = {
    require(keep >= 1, s"must keep at least the newest version, got $keep")
    val meta = readMeta(name)
    val t = getTable(name)
    // shared retention core (LineageTable.retained — ONE implementation
    // of the keep/lone-tombstone rules) feeding the shared re-stamp swap
    restampSwap(name, meta, t.retained(keep), t.opSeq + keep,
      multiPossible = keep > 1)
  }

  /**
   * Persist a hard purge (see [[LineageTable.purge]]) — right-to-be-
   * forgotten erasure of every version of matching keys, with version
   * addressing preserved for every other key. The surviving lineage is
   * ranked at FULL depth and goes through the same re-stamped
   * crash-tolerant swap as [[vacuum]] (strict shadowing: a crash-leftover
   * tail — which could still contain purged rows — is shadowed for
   * snapshots and reclaimed by the next purge/vacuum/compaction; run one
   * of them to completion before attesting erasure).
   */
  def purge(name: String, predicate: org.apache.spark.sql.Column): LineageTable = {
    val meta = readMeta(name)
    val t = getTable(name)
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col(t.keyCol))
    val ranked = t.purge(predicate).lineage
      .withColumn("_rn", row_number().over(
        byKey.orderBy(col(LineageTable.VER).desc)))
    // deepest surviving history decides the stamp budget (one aggregate;
    // purge is a rare compliance op)
    val depth = Option(ranked.agg(max(col("_rn"))).collect()(0).get(0))
      .fold(1)(_.asInstanceOf[Int]).max(1)
    restampSwap(name, meta, ranked, t.opSeq + depth,
      multiPossible = depth > 1)
  }

  /**
   * Shared persistence core for [[vacuum]] and [[purge]]: re-stamp the
   * ranked surviving rows ABOVE every old version (rank r of a key gets
   * `opSeqNew + 1 - r`, preserving per-key order — rank 1 is exactly
   * opSeqNew for every key), stage as the new base, swap crash-safely,
   * drop the tail.
   *
   * Crash tolerance: at every crash point the readable state is
   * consistent — before the swap nothing changed; after the swap a
   * leftover tail's rows rank strictly BELOW the re-stamped base rows
   * (no (key,_ver) ties), so snapshots are correct and version reads
   * transiently see pre-op history until the next swap reclaims it.
   * Meta ordering: op_seq advances BEFORE the swap (commit's rule — a
   * crash leaves a version gap, never a reused stamp), but multi_ver may
   * only transition true→false AFTER the swap (the fast path must never
   * see a multi-version base), so the pre-swap write keeps the
   * CONSERVATIVE value — too-true is merely slower, too-false reads
   * superseded versions as live. The exact multi_ver comes from the
   * staged data itself: any _ver below opSeqNew is a rank≥2 row (pruned
   * single-column scan of what was just written).
   */
  private def restampSwap(name: String, meta: Meta, ranked:
      org.apache.spark.sql.DataFrame, opSeqNew: Int,
      multiPossible: Boolean): LineageTable = {
    val layoutCol = meta.index.getOrElse(meta.key)
    val staged = s"${dir(name)}/base_staged"
    ranked
      .withColumn(LineageTable.VER, lit(opSeqNew) + 1 - col("_rn"))
      .drop("_rn")
      .repartitionByRange(col(layoutCol))
      .sortWithinPartitions(col(layoutCol))
      .write.mode(SaveMode.Overwrite).parquet(staged)
    val hasMulti = multiPossible && !spark.read.parquet(staged)
      .where(col(LineageTable.VER) < opSeqNew).isEmpty
    val conservative = meta.multiVer || multiPossible
    writeMeta(name, meta.copy(opSeq = opSeqNew, multiVer = conservative))
    swapBase(name)
    deleteRecursively(Paths.get(dir(name), "tail"))
    if (conservative != hasMulti)
      writeMeta(name, meta.copy(opSeq = opSeqNew, multiVer = hasMulti))
    getTable(name)
  }

  /**
   * Build a physical index on `column` (reference: Index.create_index,
   * lstore/index.py:59): re-layout the base range-partitioned + sorted by
   * that column and record it in the metadata, so secondary probes prune
   * at file/row-group level instead of scanning the snapshot.
   */
  def createIndex(name: String, column: String): LineageTable = {
    val t = getTable(name)
    require(t.dataCols.contains(column), s"no such column: $column")
    writeMeta(name, readMeta(name).copy(index = Some(column)))
    saveCompacted(name, t)
    getTable(name)
  }

  /** Drop the index (reference: Index.drop_index, lstore/index.py:66):
    * forget the metadata and restore the default key layout. */
  def dropIndex(name: String): LineageTable = {
    writeMeta(name, readMeta(name).copy(index = None))
    saveCompacted(name, getTable(name))
    getTable(name)
  }

  /** The indexed column, if an index exists (reference: Index surface). */
  def indexOf(name: String): Option[String] = readMeta(name).index

  /** Drop a table and its files (reference: Database.drop_table). */
  def dropTable(name: String): Unit = deleteRecursively(Paths.get(dir(name)))

  /** Catalog inventory: name, live-row count, column count. Empty
    * warehouse → empty result (not an error).
    *
    * Compacted tables (empty tail) answer from parquet FOOTERS: after
    * compaction the base holds exactly the live rows (tombstones folded
    * out), so live-row count = footer row count — O(files) metadata reads,
    * no data scan (graft.sources.ParquetMeta). Tables with a live tail
    * still need the snapshot count (old versions/tombstones in the tail
    * make raw row counts ≠ live rows). At 100 TB the warehouse steady
    * state is compacted, so an inventory normally scans nothing. */
  def inventory(): org.apache.spark.sql.DataFrame = {
    val (compacted, tailed) = tableNames.partition { n =>
      val tailDir = Paths.get(dir(n), "tail")
      // footer counts are only truthful for a live-rows-only base: a
      // keep>1 vacuum leaves history (and possibly tombstones) in the
      // base, so multi_ver tables take the snapshot-count path
      !(Files.isDirectory(tailDir) && hasParquet(tailDir)) &&
        !readMeta(n).multiVer
    }
    val viaFooters =
      if (compacted.isEmpty) None
      else Some(graft.sources.ParquetMeta.inventory(spark, compacted.map(n =>
        (n, baseDir(n).toString, readMeta(n).columns.length))))
    val viaSnapshot = tailed.map { n =>
      val t = getTable(n)
      t.snapshot.agg(count(lit(1)).as("n_rows"))
        .select(lit(n).as("tbl"), col("n_rows"),
          lit(t.dataCols.length).as("n_cols"))
    }
    (viaFooters.toSeq ++ viaSnapshot).reduceOption(_ unionByName _)
      .getOrElse(spark.range(0)
        .select(lit("").as("tbl"), lit(0L).as("n_rows"), lit(0).as("n_cols")))
  }

  // ------------------------------------------------------------- metadata

  private case class Meta(key: String, columns: Seq[String],
                          index: Option[String], opSeq: Int,
                          /** True when the base itself holds multi-version
                            * history (a keep>1 vacuum) — the empty-tail
                            * fast path and footer inventory must not fire. */
                          multiVer: Boolean = false)

  // Metadata names are restricted to identifier characters at write time,
  // so the flat JSON below round-trips through the regex reader with no
  // escaping ambiguity (a quote/backslash/']' in a name would otherwise
  // silently corrupt it).
  private val ident = "^[A-Za-z0-9_]+$".r

  private def checked(s: String): String = {
    require(ident.matches(s), s"identifier must be [A-Za-z0-9_]+: '$s'")
    s
  }

  private def writeMeta(name: String, m: Meta): Unit = {
    val cols = m.columns.map(c => "\"" + checked(c) + "\"").mkString(", ")
    val idx = m.index.map(i => "\"" + checked(i) + "\"").getOrElse("null")
    val json = s"""{"key": "${checked(m.key)}", "columns": [$cols], """ +
      s""""index": $idx, "op_seq": ${m.opSeq}, "multi_ver": ${m.multiVer}}"""
    Files.writeString(metaPath(name), json)
  }

  private def readMeta(name: String): Meta = {
    require(Files.exists(metaPath(name)), s"no such table: $name")
    val json = Files.readString(metaPath(name))
    // metadata is written by writeMeta above — a flat object of checked
    // identifiers and an int; regexes are unambiguous here.
    val key = "\"key\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(json).get.group(1)
    val cols = "\"columns\"\\s*:\\s*\\[([^\\]]*)\\]".r
      .findFirstMatchIn(json).get.group(1)
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
    val idx = "\"index\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(json).map(_.group(1))
    val seq = "\"op_seq\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(json).map(_.group(1).toInt).getOrElse(0)
    // absent in metas written before the field existed → false
    val mv = "\"multi_ver\"\\s*:\\s*(true|false)".r
      .findFirstMatchIn(json).exists(_.group(1) == "true")
    Meta(key, cols, idx, seq, mv)
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
