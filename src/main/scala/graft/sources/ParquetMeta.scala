package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * Metadata-only parquet statistics: row counts served from file footers,
 * never from data scans.
 *
 * Scale rationale: a catalog inventory (reference: Database.create_table /
 * get_table, lstore/db.py:441) over a 100 TB warehouse must not cost a
 * full scan per table — parquet already stores the exact row count per
 * row-group in the footer, so the correct plan is O(number of files)
 * footer reads, distributed over executors, reading a few KB each. This
 * is what DuckDB/Trino/Hive do for unfiltered COUNT(*) on parquet; Spark
 * only does it on the DSv2 read path (`spark.sql.parquet.aggregatePushdown`),
 * which `spark.read.parquet` (V1) never takes — so we read the footers
 * directly.
 */
object ParquetMeta {

  /** All part-files of a parquet table path (single file or directory). */
  private def partFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles.toSeq
        .filter(p => p.isFile && p.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath)
    else Seq(f.getAbsolutePath)
  }

  /** Exact row count of one parquet file, from its footer (no data pages). */
  def footerRowCount(file: String): Long = {
    val in = HadoopInputFile.fromPath(new Path(file), new Configuration())
    val r = ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /**
   * (table, n_rows) for a set of tables, one distributed footer-read job:
   * the (table, file) pairs fan out over executors, each task reads only
   * footer bytes, and the per-table sum is a tiny reduceByKey.
   */
  def rowCounts(spark: SparkSession, tables: Seq[(String, String)]): DataFrame = {
    val pairs = tables.flatMap { case (name, path) =>
      partFiles(path).map(name -> _)
    }
    val schema = StructType(Seq(
      StructField("tbl", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false)))
    val counted = spark.sparkContext
      .parallelize(pairs, math.min(pairs.size max 1, 64))
      .map { case (name, file) => (name, footerRowCount(file)) }
      .reduceByKey(_ + _)
      .map { case (name, n) => Row(name, n) }
    spark.createDataFrame(counted, schema)
  }

  /**
   * (tbl, n_rows, n_cols) inventory from footers alone — the one shape
   * both catalog inventories (CoreQueries cat_tables, Catalog.inventory)
   * share, kept here so a fix reaches both. `tables`: (name, path,
   * column count).
   */
  def inventory(spark: SparkSession,
                tables: Seq[(String, String, Int)]): DataFrame =
    rowCounts(spark, tables.map(t => t._1 -> t._2))
      .join(broadcast(
        spark.createDataFrame(tables.map(t => t._1 -> t._3)).toDF("tbl", "nc")),
        "tbl")
      .select(col("tbl"), col("n_rows"), col("nc").cast("int").as("n_cols"))
}
