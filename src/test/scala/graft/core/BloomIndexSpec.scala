package graft.core

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Hash-skipping index (Catalog.createBloomFilter): parquet bloom filters
  * must actually land in every data file — base after the creation
  * rewrite AND later tail appends — survive reopen, and never change
  * results. */
class BloomIndexSpec extends SparkSpec {

  import spark.implicits._

  /** True iff every row group of every parquet file under `dir` is
    * equality-SKIPPABLE on `column`: it carries a bloom filter, or its
    * chunk is dictionary-encoded (parquet-mr deliberately omits the
    * bloom then — the dictionary itself gives EXACT row-group screening
    * via DictionaryFilter, and blooms kick in precisely when the
    * dictionary falls back at high cardinality, which is the case the
    * index exists for). */
  private def allGroupsEqualitySkippable(dir: String, column: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(files.nonEmpty, s"no parquet files under $dir")
    files.forall { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try r.getFooter.getBlocks.asScala.forall { block =>
        val cc = block.getColumns.asScala
          .find(_.getPath.toDotString == column).get
        val dictEncoded = cc.getEncodings.asScala.exists(e =>
          e.toString.contains("DICTIONARY"))
        r.getBloomFilterDataReader(block).readBloomFilter(cc) != null ||
          dictEncoded
      } finally r.close()
    }
  }

  /** True iff at least one row group under `dir` carries an actual bloom
    * filter for `column` (the non-dictionary case really exercised). */
  private def someGroupBloomFiltered(dir: String, column: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet")).exists { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try r.getFooter.getBlocks.asScala.exists { block =>
        val cc = block.getColumns.asScala
          .find(_.getPath.toDotString == column).get
        r.getBloomFilterDataReader(block).readBloomFilter(cc) != null
      } finally r.close()
    }
  }

  private def base =
    (1L to 200L).map(k => (k, k * 7 % 1000, s"s$k")).toDF("k", "v", "s")

  test("creation bakes blooms into the base; later tail appends carry them") {
    val wh = Files.createTempDirectory("graft_bloom_wh_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k", base)
    cat.commit("t", Txn.empty.update(col("k") % 5 === 0,
      Map("v" -> (col("v") + org.apache.spark.sql.functions.lit(1)))))
    cat.createBloomFilter("t", "v")
    assert(cat.bloomColsOf("t") === Seq("v"))
    assert(allGroupsEqualitySkippable(s"$wh/t/base", "v"))
    assert(someGroupBloomFiltered(s"$wh/t/base", "v"),
      "expected a real bloom filter in the freshly-baked base")
    // a post-creation commit's tail files carry the filter too
    cat.commit("t", Txn.empty.update(col("k") % 7 === 0,
      Map("v" -> (col("v") + org.apache.spark.sql.functions.lit(2)))))
    assert(allGroupsEqualitySkippable(s"$wh/t/tail", "v"))
    // creation used the history-PRESERVING rewrite: versions still read
    assert(cat.getTable("t").asOfRelative(-1).count() === 200L)
  }

  test("probes on a bloom-filtered column: identical results, pushed filter") {
    val wh = Files.createTempDirectory("graft_bloom_probe_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k", base)
    val plain = cat.getTable("t").snapshot
      .where(col("v") === 14L).select("k").as[Long].collect().toSet
    cat.createBloomFilter("t", "v")
    val bloomed = cat.getTable("t").snapshot
      .where(col("v") === 14L).select("k").as[Long].collect().toSet
    assert(bloomed === plain)
    // the equality predicate reaches the scan (bloom consult is inside
    // parquet-mr's row-group filter — pushdown is its precondition)
    val plan = cat.getTable("t").snapshot.where(col("v") === 14L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("v"))
  }

  test("the bloom layout survives reopen and a further compaction") {
    val wh = Files.createTempDirectory("graft_bloom_reopen_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    cat.createTable("t", "k", base)
    cat.createBloomFilter("t", "v")
    val cat2 = new Catalog(spark, wh, autoCompact = false)
    assert(cat2.bloomColsOf("t") === Seq("v"))
    cat2.commit("t", Txn.empty.delete(col("k") % 3 === 0))
    cat2.foldTail("t")
    assert(allGroupsEqualitySkippable(s"$wh/t/base", "v"))
  }
}
