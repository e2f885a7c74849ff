package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Physical-layout levers for 100 TB operation: bucketing (shuffle-free
 * co-located joins) and salting (skew spreading). Neither changes query
 * semantics — PlanAuditSpec proves the plan shape, result-equality specs
 * prove the semantics.
 */
object Layout {

  /**
   * Write both sides bucketed by the join key into the session catalog.
   * A subsequent equi-join on `key` between the two bucketed tables needs
   * NO Exchange: partitioning is established at write time, which is the
   * Spark-native version of the reference keeping records key-clustered in
   * page ranges. At 100 TB this converts the nightly fact-fact join from
   * two full shuffles into a zip of pre-sorted buckets.
   */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    // the session catalog is per-JVM but the managed location is not: a
    // previous run may have left the directory behind with no catalog
    // entry, and saveAsTable refuses to adopt an existing location
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    // ONE FILE PER BUCKET: repartition by the key to the bucket count
    // first (the same murmur3 hash bucketBy assigns with, so each task
    // holds exactly one bucket's rows). Multi-file buckets make Spark
    // distrust the written sortBy order and re-SORT the bucketed side
    // of every join — at 1.17B standing edges that re-sort WAS the
    // per-round cost (r11, measured on q_pagerank). One build-time
    // shuffle buys sorted zero-exchange probes forever after.
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key (shuffle-free when both
    * were written with the same bucket count). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /**
   * Morton (Z-order) interleave of two non-negative integer columns:
   * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Sorting by
   * the interleaved value clusters rows so that any contiguous run is a
   * bounded rectangle in (a, b) space — which makes parquet min-max
   * statistics selective on BOTH columns at once (a single-column sort
   * makes them selective on that column only).
   */
  def morton(a: Column, b: Column, bits: Int): Column =
    morton(Seq(a, b), bits)

  /** N-column Morton interleave (r10): bit i of column j lands at
    * position i·n + j — the 2-column layout generalized, bit-identical
    * to the historical form for n = 2. n·bits must fit a long's
    * non-sign bits, so 3 columns keep the default 16 bits (48 used)
    * and 4 columns need bits ≤ 15. */
  def morton(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"morton needs at least 2 columns, got $n")
    require(n * bits <= 63,
      s"morton: $n columns x $bits bits overflows a long — lower bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (z, (c, j)) =>
        z.bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /**
   * Z-order re-layout by two columns — the multi-column generalization of
   * Catalog.createIndex's single-column sorted layout (reference:
   * Index.create_index, lstore/index.py:59, which builds one index per
   * column; Z-order serves range probes on either or both columns from
   * ONE layout). Each column min-max scales to `bits` bits against its
   * own stats (computed in-plan and broadcast — no driver collect), the
   * morton codes range-partition the rows, and every output file covers a
   * bounded (cA, cB) rectangle: a range probe on either column row-group-
   * prunes to the files whose rectangle intersects it.
   */
  def zorder(df: DataFrame, cA: String, cB: String,
             bits: Int = 16, partitions: Int = 0): DataFrame =
    zorder(df, Seq(cA, cB), bits, partitions)

  /** N-column form (r10): each column min-max scales to `bits` bits
    * against its own in-plan broadcast stats, the N-way morton codes
    * range-partition the rows, and every output file covers a bounded
    * N-dimensional box — a range probe on ANY of the columns row-group-
    * prunes to the files whose box intersects it (3-4 column layouts
    * are routine lakehouse practice; selectivity per column dilutes as
    * N grows, the usual guidance to stop near 4). */
  def zorder(df: DataFrame, cols: Seq[String],
             bits: Int, partitions: Int): DataFrame =
    zorderWithin(df, Seq.empty, cols, bits, partitions)

  /** Z-order WITHIN a directory prefix (r13 — partition by day, Z-order
    * within each partition, the Delta `OPTIMIZE ZORDER BY` layout on a
    * partitioned table): rows cluster by (`prefix`..., morton code), so
    * each write task holds contiguous runs per partition directory AND
    * every file inside a directory covers a bounded N-dimensional box
    * over `cols`. Stats scale globally (one broadcast agg, not a
    * per-partition join) — within any single directory the z-range is a
    * sub-interval, so the box bound per file holds there too. Empty
    * `prefix` is exactly [[zorder]]. */
  def zorderWithin(df: DataFrame, prefix: Seq[Column], cols: Seq[String],
                   bits: Int, partitions: Int): DataFrame = {
    val nParts = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val stats = df.agg(
      min(col(cols.head).cast("double")).as(s"_min_${cols.head}"),
      cols.tail.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"_min_$c"),
        max(col(c).cast("double")).as(s"_max_$c"))) :+
        max(col(cols.head).cast("double")).as(s"_max_${cols.head}"): _*)
    val top = (1L << bits) - 1
    def scaled(c: String): Column = {
      val (lo, hi) = (col(s"_min_$c"), col(s"_max_$c"))
      when(hi === lo, lit(0L)).otherwise(
        floor((col(c).cast("double") - lo) / (hi - lo) * top).cast("long"))
    }
    val keys = prefix :+ col("_z")
    df.crossJoin(broadcast(stats))
      .withColumn("_z", morton(cols.map(scaled), bits))
      .repartitionByRange(nParts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop(cols.flatMap(c => Seq(s"_min_$c", s"_max_$c")) :+ "_z": _*)
  }

  /**
   * Exact top-N per group, parallel across the whole cluster. The naive
   * `row_number() OVER (PARTITION BY group ORDER BY ...)` puts each
   * GROUP's entire data on ONE reducer — with few groups (language
   * strata, a handful of tenants) that is a handful of busy cores no
   * matter how large the cluster (the shape q_percentile measured at
   * ~×95 on 100× data before its parallel rewrite). Instead, the
   * q_percentile decomposition: (1) range-partition rows by
   * (group, order) so partition i's rows all precede partition i+1's in
   * the global order; (2) rank locally per (partition, group) — balanced
   * over ALL reducers; (3) global rank = local rank + the group's
   * cumulative count in earlier partitions (a tiny nParts×groups
   * histogram, broadcast); keep rank ≤ n. Partitions whose group offset
   * already exceeds n are dropped before the join — at 100 TB the
   * surviving join probes only the head partitions of each stratum.
   *
   * `orderCols` must be a TOTAL order within each group (add a key
   * tie-break) or ranks are nondeterministic. Output = input columns +
   * `_rank` (1-based global rank within the group).
   */
  def topNPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[String], n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = df.sparkSession
    val keys = (groupCols ++ orderCols).map(col)
    val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = df.repartitionByRange(nParts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("_pid", spark_partition_id())
    val wLocal = Window.partitionBy(("_pid" +: groupCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val local = parts.withColumn("_lrn", row_number().over(wLocal))
    val hist = local.groupBy(("_pid" +: groupCols).map(col): _*)
      .agg(count(lit(1)).as("_cnt"))
    val wOff = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist
      .withColumn("_off", coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
      .where(col("_off") < n)
      .select(groupCols.map(c => col(c).as(s"_g_$c")) ++
        Seq(col("_pid").as("_opid"), col("_off")): _*)
    val joinCond = (groupCols.map(c => col(c) === col(s"_g_$c")) :+
      (col("_pid") === col("_opid"))).reduce(_ && _)
    local.join(broadcast(offs), joinCond)
      .withColumn("_rank", (col("_lrn") + col("_off")).cast("long"))
      .where(col("_rank") <= n)
      .drop(groupCols.map(c => s"_g_$c") ++
        Seq("_opid", "_off", "_pid", "_lrn"): _*)
  }

  /**
   * Skew-spreading join: fact rows salt into `nSalts` sub-keys using a
   * row-varying deterministic expression; the (small) dim side replicates
   * per salt. A hot key's rows land on nSalts partitions instead of one.
   * AQE's skew-join handles moderate skew adaptively; explicit salting is
   * for the pathological keys AQE cannot split (single-key aggregations,
   * stateful streaming partitions).
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: Column, nSalts: Int): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(saltBy), lit(nSalts.toLong)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
