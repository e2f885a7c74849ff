package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Catalog

/**
 * Plan audits: the scale claims in SURVEY §3/§5 as assertions.
 * These inspect executed plans, not results — a regression here means a
 * query silently became a full scan / shuffle join and would fall over at
 * 100 TB even though small-SF results stay correct.
 */
class PlanAuditSpec extends SparkSpec {

  private def executedPlan(df: DataFrame): String = {
    df.queryExecution.toRdd.count() // finalize AQE
    // AdaptiveSparkPlan.toString prints the final plan then repeats the
    // initial plan — audit only the final one.
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("catalog point lookup pushes the key predicate to every parquet scan") {
    val wh = Files.createTempDirectory("graft_audit_").toString
    // autoCompact off: the audit needs a live tail to prove BOTH scans
    // receive the pushed filter
    val cat = new Catalog(spark, wh, autoCompact = false)
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    cat.createTable("t", "k", rows)
    cat.commit("t", graft.core.Txn.empty
      .update(col("k") % 2 === 0, Map("price" -> (col("price") + 1.0))))
    val q = cat.getTable("t").snapshot.where(col("k") === 42L)
    val plan = executedPlan(q)
    // base scan AND tail scan must both receive the pushed key filter —
    // this is the distributed Index.locate: rowgroup stats skip everything
    // but the matching key range.
    val pushed = "PushedFilters: \\[[^\\]]*EqualTo\\(k,42\\)".r
      .findAllIn(plan).size
    assert(pushed == 2, s"expected key pushdown into base+tail scans:\n$plan")
  }

  test("q3/q5 join dimensions by broadcast, not shuffle") {
    val p3 = executedPlan(SparkEntry.queries("q3_join_topn")(spark, sfDir))
    assert(p3.contains("BroadcastHashJoin"), p3)
    val p5 = executedPlan(SparkEntry.queries("q5_join_multi")(spark, sfDir))
    assert(p5.contains("BroadcastHashJoin"), p5)
    assert(!p5.contains("CartesianProduct"), p5)
  }

  test("q1_agg scan is column-pruned to the referenced columns only") {
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    df.queryExecution.toRdd.count()
    // toString truncates FileScan details; formatted mode keeps them
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).get.group(1)
    val cols = read.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"), s"scan reads: $cols")
    // and the shipdate filter reaches the scan
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan)
  }

  test("snapshot: zero shuffles when compacted, exactly one with a tail") {
    val wh = Files.createTempDirectory("graft_audit2_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    cat.createTable("t", "k", rows)
    // no tail → snapshot ≡ base: a pure scan, no window, no shuffle
    val p0 = executedPlan(cat.getTable("t").snapshot)
    assert(!p0.contains("Exchange") && !p0.contains("Window"),
      s"compacted snapshot should be a bare scan:\n$p0")
    // with a tail → version reconstruction costs exactly one key shuffle
    cat.commit("t", graft.core.Txn.empty
      .update(col("k") % 2 === 0, Map("price" -> (col("price") + 1.0))))
    val p1 = executedPlan(cat.getTable("t").snapshot)
    val shuffles = "Exchange hashpartitioning\\(k#".r.findAllIn(p1).size
    assert(shuffles == 1, s"expected exactly 1 key shuffle, plan:\n$p1")
  }

  test("secondary probe windows only semi-joined candidate keys") {
    val wh = Files.createTempDirectory("graft_audit3_").toString
    val cat = new Catalog(spark, wh)
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
              col("o_totalprice").as("price"))
    cat.createTable("t", "k", rows)
    cat.commit("t", graft.core.Txn.empty
      .update(col("k") % 2 === 0, Map("price" -> (col("price") + 1.0))))
    val t = cat.getTable("t")
    val probed = t.probe(col("ck") === 77L)
    // correctness: identical to filtering the full snapshot
    val want = t.snapshot.where(col("ck") === 77L).collect().map(_.toSeq).toSet
    assert(probed.collect().map(_.toSeq).toSet === want)
    val plan = executedPlan(probed)
    // the candidate scan carries the pushed secondary predicate, and the
    // lineage is semi-joined down to candidate keys BEFORE the window
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(ck,77\\)".r
      .findFirstIn(plan).isDefined, plan)
    assert(plan.contains("LeftSemi"), plan)
  }

  test("WindowProbeRule rewrites a plain snapshot filter into the probe shape") {
    // no explicit probe() call — the extension rule must inject the
    // candidate-key semi-join under the window on its own
    val wh = Files.createTempDirectory("graft_audit4_").toString
    val cat = new Catalog(spark, wh)
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
              col("o_totalprice").as("price"))
    cat.createTable("t", "k", rows)
    cat.commit("t", graft.core.Txn.empty
      .update(col("k") % 2 === 0, Map("price" -> (col("price") + 1.0))))
    val t = cat.getTable("t")
    val q = t.snapshot.where(col("ck") === 77L)
    assert(q.collect().map(_.toSeq).toSet ===
      t.probe(col("ck") === 77L).collect().map(_.toSeq).toSet)
    val plan = executedPlan(q)
    assert(plan.contains("LeftSemi"), s"rule did not fire:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(ck,77\\)".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("SQL front door plans identically to the DataFrame route") {
    // ls_select_point / ls_sum_range / ls_count_range route through
    // spark.sql over the registered snapshot view — the executed plan
    // must be THE SAME as the directly-built DataFrame's (modulo expr
    // ids), so every pushdown/probe lever fires for SQL users too
    def normalize(p: String): String =
      p.replaceAll("#\\d+[L]?", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
        .replaceAll("\\[id=#x\\]", "")
    val lin = graft.queries.CoreQueries.ordersLineage(spark, sfDir)
    val pairs: Seq[(String, DataFrame)] = Seq(
      "ls_select_point" -> lin.snapshot
        .where(col("k").isin(42L, 45L, 100L, 4211L, 34L))
        .select(col("k"), col("status"), col("totalprice")),
      "ls_sum_range" -> lin.snapshot.where(col("k").between(0L, 5000L))
        .agg((sum(round(col("totalprice") * 100).cast("long")) / 100.0)
          .as("sum_price")),
      "ls_count_range" -> lin.snapshot.where(col("k").between(0L, 5000L))
        .agg(count(lit(1)).as("n")))
    pairs.foreach { case (name, df) =>
      val viaSql = normalize(executedPlan(SparkEntry.queries(name)(spark, sfDir)))
      val viaDf = normalize(executedPlan(df))
      assert(viaSql === viaDf, s"$name: SQL and DataFrame plans diverge")
    }
  }

  test("SQL MERGE INTO executes the identical plan to the Column-API merge") {
    // ls_merge_into routes through graft.sql.GraftSql: Spark's parser →
    // the engine's Txn.mergeInto. The WRITE path must be the same
    // distributed op either way — one source scan, candidate semi-join,
    // left-outer merge join, one _ver stamp — so the SQL surface
    // inherits the delta-proportional cost (∝ |source|, never table).
    def normalize(p: String): String =
      p.replaceAll("#\\d+[L]?", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
        .replaceAll("\\[id=#x\\]", "")
    val viaSql = normalize(executedPlan(
      SparkEntry.queries("ls_merge_into")(spark, sfDir)))
    val viaDf = normalize(executedPlan(
      graft.queries.CoreQueries.ordersLineage(spark, sfDir)
        .mergeInto(graft.queries.CoreQueries.mergeSource(spark, sfDir),
          Seq("status", "totalprice"),
          deleteWhen = Some(col("custkey") % 50 === 0))
        .snapshot.where(col("k") % 5 === 0)))
    assert(viaSql === viaDf, "SQL MERGE and Column-API merge plans diverge")
  }

  test("ANALYZE NDV stats flip the join strategy; results unchanged") {
    // Spark's size-only estimator cannot see that GROUP BY status is 3
    // rows while GROUP BY custkey is ~thousands — both estimates track
    // the child SCAN size. analyzeTable's KMV NDVs separate them:
    // NdvBroadcastRule broadcasts the low-NDV aggregate and refuses the
    // high-NDV one, under a threshold that the raw scan size exceeds
    // (the at-scale shape: a 100 TB fact's dim-like aggregate).
    val wh = Files.createTempDirectory("graft_ndv_audit_").toString
    val cat = new Catalog(spark, wh)
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_custkey").as("custkey"),
        col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
    cat.createTable("t", "k", rows)
    val fact = spark.read.parquet(s"$sfDir/orders.parquet")
    // AQE OFF for the audit: its runtime re-plan converts to broadcast
    // AFTER the dim's shuffle stage materializes — by which point the
    // fact side's shuffle WRITE (the cost that dominates at 100 TB) has
    // already happened. The NDV stats act at STATIC planning time, where
    // that write is avoided entirely; AQE stays the runtime safety net
    // for un-analyzed tables.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "2KB")
    try {
      val dimS = cat.getTable("t").snapshot.groupBy(col("status"))
        .agg(avg(col("price")).as("avg_price"))
      val dimC = cat.getTable("t").snapshot.groupBy(col("custkey"))
        .agg(avg(col("price")).as("avg_price"))
      def planOf(dim: DataFrame, on: String, key: String) = executedPlan(
        fact.join(dim, fact(on) === dim(key)))
      // BEFORE analyze: no stats — the 2KB threshold rejects both sides
      // (scan-proportional estimates), so no broadcast either way
      val before = planOf(dimS, "o_orderstatus", "status")
      assert(!before.contains("BroadcastHashJoin"),
        s"fixture assumption broken — already broadcasting:\n$before")
      val beforeRows = fact.join(dimS,
          fact("o_orderstatus") === dimS("status"))
        .groupBy().count().head().getLong(0)
      cat.analyzeTable("t", Seq("status", "custkey"))
      // AFTER: the status aggregate (NDV=3, ~100 bytes) broadcasts...
      val after = planOf(dimS, "o_orderstatus", "status")
      assert(after.contains("BroadcastHashJoin"),
        s"NDV stats failed to flip the strategy:\n$after")
      // ...while the custkey aggregate (high NDV, over the threshold)
      // is REFUSED the broadcast the size estimator alone can't judge
      val highNdv = planOf(dimC, "o_custkey", "custkey")
      assert(!highNdv.contains("BroadcastHashJoin"),
        s"high-NDV side must not broadcast at this threshold:\n$highNdv")
      // correctness unchanged: stats inform strategy, never results
      val afterRows = fact.join(dimS,
          fact("o_orderstatus") === dimS("status"))
        .groupBy().count().head().getLong(0)
      assert(afterRows === beforeRows)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("idx_multi: BOTH projection probes push their predicate and semi-join") {
    val q = SparkEntry.queries("idx_multi")(spark, sfDir)
    val plan = executedPlan(q)
    // each probe's candidate discovery is a pruned scan of its own slim
    // sorted (column, key) projection — the pushed predicate against the
    // sorted layout is what row-group-prunes (min-max stats selective);
    // the point predicate and the range predicate must BOTH reach a scan
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(custkey,77\\)".r
      .findFirstIn(plan).isDefined, plan)
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(totalprice,1000.0\\)".r
      .findFirstIn(plan).isDefined, plan)
    // candidates reach the lineage via semi-joins (the probe shape), and
    // the candidate scans are the SLIM projections, not the full table:
    // a two-column (column, key) read schema appears for each
    assert(plan.contains("LeftSemi"), plan)
    assert("ReadSchema: struct<custkey:bigint,k:bigint>".r
      .findFirstIn(plan).isDefined, plan)
    assert("ReadSchema: struct<totalprice:double,k:bigint>".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("idx_secondary probe pushes the indexed-column predicate to the scan") {
    val q = SparkEntry.queries("idx_secondary")(spark, sfDir)
    val plan = executedPlan(q)
    // the index is a physical layout: the base is range-partitioned +
    // sorted by custkey, so this pushed filter prunes files/row-groups
    // instead of scanning the snapshot (distributed Index.locate_range).
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(custkey,100\\)".r
      .findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("Exchange hashpartitioning(custkey"),
      s"probe should not reshuffle on the indexed column:\n$plan")
  }

  test("q_partition_prune: the base scan plans ONLY the probed partition " +
      "(r11 — PartitionFilters below the snapshot window)") {
    val q = SparkEntry.queries("q_partition_prune")(spark, sfDir)
    q.collect()
    val plan = executedPlan(q)
    // the directory filter reached the base scan (whole partitions are
    // planned away — PartitionSpec pins the strict file-count drop)...
    assert("PartitionFilters: \\[[^\\]]*_pd[^\\]]*= pO".r
      .findFirstIn(plan).isDefined, s"expected a _pd partition filter:\n$plan")
    // ...and the flat tail got the same predicate pushed to its scan
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(status,O\\)".r
      .findFirstIn(plan).isDefined, s"expected pushed tail filter:\n$plan")
    // both BELOW the snapshot window: the Window sits above the union
    assert(plan.indexOf("PartitionFilters") > plan.indexOf("Window"),
      s"pruning must be below the reconstruction window:\n$plan")
  }

  test("q_partition_in: IN-list routes to the directory SET on both " +
      "identity and bucket levels (r13)") {
    val q = SparkEntry.queries("q_partition_in")(spark, sfDir)
    q.collect()
    val plan = executedPlan(q)
    // identity level: the _pd directory filter carries the value SET
    assert("PartitionFilters: \\[[^\\]]*_pd[^\\]]* IN \\(pF,pP\\)".r
      .findFirstIn(plan).isDefined,
      s"expected an IN-list _pd partition filter:\n$plan")
    // bucket level: the two literals hashed into their directory set
    // (custkey 7 and 11 land in distinct md5 buckets: 2 and 0)
    val b7 = graft.core.Catalog.bucketOf("7", 8)
    val b11 = graft.core.Catalog.bucketOf("11", 8)
    val set = Seq(b7, b11).sorted.mkString("p", ",p", "")
    assert(("PartitionFilters: \\[[^\\]]*_pd[^\\]]* IN \\(p" + b7 +
        ",p" + b11 + "\\)|PartitionFilters: \\[[^\\]]*_pd[^\\]]* IN \\(p" +
        b11 + ",p" + b7 + "\\)").r.findFirstIn(plan).isDefined,
      s"expected a bucket-set _pd filter ($set):\n$plan")
  }

  test("idx_zorder_part: the probe prunes the partition DIRECTORY and " +
      "pushes the zorder-column ranges to the clustered scan (r13)") {
    val q = SparkEntry.queries("idx_zorder_part")(spark, sfDir)
    q.collect()
    val plan = executedPlan(q)
    // level 1: the status directory pruned at planning
    assert("PartitionFilters: \\[[^\\]]*_pd[^\\]]*= pO".r
      .findFirstIn(plan).isDefined, s"expected a _pd partition filter:\n$plan")
    // level 2: the z-ordered column ranges reached the parquet scan,
    // where the within-directory box-bounded files row-group-prune.
    // The printed PushedFilters string truncates at 100 chars, so read
    // the scan node's metadata map directly.
    val pushed = q.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "")
    }.mkString("; ")
    assert(pushed.contains("GreaterThanOrEqual(custkey,10)"),
      s"zorder filter not pushed: $pushed")
    assert(pushed.contains("LessThanOrEqual(totalprice,200000.0)"),
      s"second zorder filter not pushed: $pushed")
  }

  test("q_partition_time_route_ts: TIMESTAMP-literal bounds route to the " +
      "pruned day slice like the integral spelling (r13)") {
    val q = SparkEntry.queries("q_partition_time_route_ts")(spark, sfDir)
    q.collect()
    val plan = executedPlan(q)
    // the day-directory range filter reached the base scan
    assert("PartitionFilters: \\[[^\\]]*_pd".r.findFirstIn(plan).isDefined,
      s"expected a _pd day-range partition filter:\n$plan")
    assert(plan.indexOf("PartitionFilters") > plan.indexOf("Window"),
      s"pruning must be below the reconstruction window:\n$plan")
  }

  test("q_bucketed_join: fact-fact join + same-key agg with ZERO Exchange") {
    // at bench SFs one side broadcasts (correct there); the 100 TB claim
    // is the broadcast-impossible case, so audit with broadcast disabled:
    // bucketing established the partitioning at write time and the
    // sort-merge join + same-key aggregation must run with NO Exchange of
    // any kind — a single one means the layout lever silently died
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executedPlan(SparkEntry.queries("q_bucketed_join")(spark, sfDir))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ls_select_secondary composes probe AND index: pushed candidate scans") {
    val q = SparkEntry.queries("ls_select_secondary")(spark, sfDir)
    val plan = executedPlan(q)
    // WindowProbeRule injected the candidate-key semi-join...
    assert(plan.contains("LeftSemi"), s"probe rule did not fire:\n$plan")
    // ...and the candidate side's pushed custkey predicate reaches BOTH
    // scans (indexed base + live tail), where the custkey-sorted base
    // layout turns it into row-group pruning
    val pushed = "PushedFilters: \\[[^\\]]*EqualTo\\(custkey,77\\)".r
      .findAllIn(plan).size
    assert(pushed >= 2, s"expected pushed candidate filters on base+tail:\n$plan")
  }

  test("jaccard blocks via capped shingle groups — no self-join, no sort") {
    // the hot-shingle df cap lives INSIDE the single shingle aggregation
    // (collect_capped saturates its buffer and NULLs groups past the cap),
    // so the plan has no shingle self-join, no sort-merge, and no separate
    // df-count subplan — one grouping pass bounds both memory and the
    // candidate-pair count at corpus scale.
    val plan = executedPlan(SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir))
    assert(plan.contains("collect_capped"), s"expected capped grouping:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"expected no self-join:\n$plan")
  }

  test("range join is a bucketed equi-join, not a nested-loop join") {
    // without the manufactured bucket key, `ts BETWEEN lo AND hi` has no
    // equality conjunct and Spark must plan BroadcastNestedLoopJoin —
    // broadcast-bound and quadratic. The bucketized form hash-joins.
    val plan = executedPlan(SparkEntry.queries("q_range_join")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("q_percentile ranks in value buckets, never one reducer per group") {
    // the naive exact-quantile plan windows over partitionBy(status) — 3
    // reducers total, measured ~x95 on 100x data. The parallel form
    // buckets by VALUE (withBucket — data-derived pids, the r9
    // determinism fix replacing the sampled range partitioner) and
    // windows over (bucket, group).
    val plan = executedPlan(SparkEntry.queries("q_percentile")(spark, sfDir))
    // no sampled range exchange anywhere — the bucket id is a column
    assert(!plan.contains("rangepartitioning"), plan)
    // the row-ranking window shuffles on (bucket-id, group) — balanced
    // over all reducers (the tiny histogram/result aggregations may hash
    // on the group alone; they carry a handful of rows)
    assert("hashpartitioning\\(pid#\\d+".r.findFirstIn(plan).isDefined, plan)
  }

  test("q_skew_join spreads the fact over salt sub-keys") {
    val plan = executedPlan(SparkEntry.queries("q_skew_join")(spark, sfDir))
    assert(plan.contains("_salt"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_pivot reads the fact once — no distinct-values discovery scan") {
    // explicit pivot values: an IMPLICIT pivot first runs a whole separate
    // job (distinct + collect) just to learn the column values — a second
    // full scan of the fact at 100 TB. With values given, the plan is one
    // scan feeding two keyed aggregations (the second, pivotfirst, carries
    // at most groups×values rows — its exchange is negligible).
    val plan = executedPlan(SparkEntry.queries("q_pivot")(spark, sfDir))
    val scans = "FileScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly 1 fact scan:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected at most 2 shuffles:\n$plan")
    assert(plan.contains("partial_count"), s"expected map-side partial:\n$plan")
  }

  test("q_histogram aggregates map-side before its single shuffle") {
    val plan = executedPlan(SparkEntry.queries("q_histogram")(spark, sfDir))
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 shuffle:\n$plan")
    // partial aggregation must appear below the exchange (map-side combine)
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"expected map-side partial agg:\n$plan")
  }

  test("q_outer_join keeps both unmatched sides (FullOuter plan)") {
    val plan = executedPlan(SparkEntry.queries("q_outer_join")(spark, sfDir))
    assert(plan.contains("FullOuter"), plan)
    // semantic spot-check: rows exist from both unmatched sides
    val df = SparkEntry.queries("q_outer_join")(spark, sfDir)
    import org.apache.spark.sql.functions.{col => c}
    assert(df.where(!c("in_segment")).count() > 0, "no order-only rows")
    assert(df.where(c("in_segment") && c("n_orders") === 0).count() > 0,
      "no customer-only rows")
  }

  // sf0.01's 500 docs are the smallest corpus where the 2x-mean
  // hash-balance bound is statistically meaningful (sfDir's 50 are not)
  private val shardBalanceSf = "/root/testdata/sf0.01"

  test("pipe_shard partitions the corpus exhaustively and near-evenly") {
    val df = SparkEntry.queries("pipe_shard")(spark, shardBalanceSf)
    val rows = df.collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = spark.read.parquet(s"$shardBalanceSf/documents.parquet").count()
    assert(total == docs, s"shards cover $total of $docs docs")
    assert(rows.length == 16, s"expected 16 shards, got ${rows.length}")
    // md5 balance: no shard more than 2x the mean (hash-uniform at 500 docs)
    val mean = total.toDouble / 16
    assert(rows.forall(_.getAs[Long]("n_docs") < 2 * mean), rows.mkString(","))
  }

  test("emb_centroid is one aggregation shuffle with map-side partials") {
    // posexplode is narrow; the only exchange is the (label, dim) agg, and
    // partial sums compact each task to ≤ groups×dims rows before it
    val plan = executedPlan(SparkEntry.queries("emb_centroid")(spark, sfDir))
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 shuffle:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"expected map-side partial agg:\n$plan")
  }

  test("text_tfidf and pipe_canonical plan no cartesian products") {
    Seq("text_tfidf", "pipe_canonical").foreach { q =>
      val plan = executedPlan(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
    }
  }

  test("dedup/minhash pipelines contain no cartesian products") {
    Seq("dedup_ngram_jaccard", "dedup_minhash", "dedup_exact").foreach { q =>
      val plan = executedPlan(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
    }
  }

  test("q_moving_agg pushes the user predicate below the window to the scan") {
    val df = SparkEntry.queries("q_moving_agg")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the partition-key filter must reach the parquet scan — at corpus
    // scale the window should shuffle 200 users' events, not all events
    assert("PushedFilters: \\[[^\\]]*LessThan\\(user_id,200\\)".r
      .findFirstIn(plan).nonEmpty, plan)
  }

  test("q_grouping_sets expands map-side with a single shuffle") {
    val plan = executedPlan(SparkEntry.queries("q_grouping_sets")(spark, sfDir))
    assert(plan.contains("Expand"), plan)
    // one exchange for the grouped agg (plus none hidden in AQE reuse)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("ls_restore appends instead of rewriting: one window over the lineage") {
    val plan = executedPlan(SparkEntry.queries("ls_restore")(spark, sfDir))
    // restore = ranked-window append + snapshot window; never a join of
    // the table against itself
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("ls_diff is one pass: a single key shuffle, no self-join") {
    val plan = executedPlan(SparkEntry.queries("ls_diff")(spark, sfDir))
    // both versions come out of ONE ranked window + conditional agg — a
    // full-outer of two snapshot reads would show a join and 2+ exchanges
    assert(!plan.contains("Join"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("q_argmax aggregates associatively: no window sort of the groups") {
    val plan = executedPlan(SparkEntry.queries("q_argmax")(spark, sfDir))
    // the win over the row_number formulation: partial max_by/min_by runs
    // MAP-SIDE (the shuffle carries one candidate per group-partition,
    // never the rows), and no per-group window sort exists. The
    // struct-ordered extremum buffers plan as SortAggregate — still one
    // exchange, still partial/final.
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_max_by"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("q_bloom_join injects the runtime bloom filter on the fact side") {
    val df = SparkEntry.queries("q_bloom_join")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the dim side's join keys reach lineitem's scan as a bloom probe
    // BEFORE the shuffle — the runtime twin of partition pruning (the
    // physical plan prints the injected BloomFilterMightContain as
    // `might_contain(Subquery ...)` over the fact's join key)
    assert(plan.contains("might_contain"), plan)
    assert(plan.contains("bloom_filter_agg"), plan)
  }

  test("src_partitioned prunes directories via the partition filter") {
    val df = SparkEntry.queries("src_partitioned")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the lang predicate must be a PARTITION filter (directory pruning,
    // no file opened), not a data filter evaluated per row
    assert("PartitionFilters: \\[[^\\]]*lang[^\\]]*\\]".r
      .findFirstIn(plan).nonEmpty, plan)
  }

  test("q_dpp injects the dim's lang set as a runtime partition filter") {
    val df = SparkEntry.queries("q_dpp")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // no literal lang predicate exists in the query — the partition
    // filter arrives at runtime from the joined dim
    assert(plan.contains("dynamicpruning"), plan)
  }

  test("q_scalar_subquery decorrelates to one aggregate + join, per row") {
    val plan = executedPlan(SparkEntry.queries("q_scalar_subquery")(spark, sfDir))
    // Catalyst rewrites the correlated scalar subquery into a grouped
    // aggregate joined on custkey — a per-row re-execution would surface
    // as a nested subquery / cartesian shape
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("ls_merge_into windows only the source's candidate keys") {
    val df = SparkEntry.queries("ls_merge_into")(spark, sfDir)
    // the target side must semi-join down to the source key set BEFORE
    // its snapshot window — merge cost ∝ |source|, never the table.
    // Asserted on the optimized LOGICAL plan: under AQE the semi-join
    // physically lives inside an already-materialized broadcast stage,
    // which the final executed-plan print elides.
    val logical = df.queryExecution.optimizedPlan.toString
    assert(logical.contains("LeftSemi"), logical)
    val plan = executedPlan(df)
    // and the merge join itself broadcasts the (small) source side
    assert(plan.contains("LeftOuter, BuildRight"), plan)
  }

  test("q_kmv_distinct aggregates map-side: partial sketch before exchange") {
    val plan = executedPlan(SparkEntry.queries("q_kmv_distinct")(spark, sfDir))
    // TypedImperativeAggregate plans as ObjectHashAggregate; the partial
    // instance must run BELOW the last exchange (k-long buffers cross
    // the wire, never raw hashes) — a single-phase plan (agg only above
    // its shuffle) would ship every row. Printed tree order: deepest
    // node last, so the scan-side partial prints AFTER every Exchange.
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.lastIndexOf("ObjectHashAggregate") > plan.lastIndexOf("Exchange"),
      s"expected a partial ObjectHashAggregate below the exchange:\n$plan")
  }

  test("ann_sql broadcasts the query vectors and group-limits the top-k") {
    val plan = executedPlan(SparkEntry.queries("ann_sql")(spark, sfDir))
    // same shape as bruteTopK: Q vectors broadcast × ONE corpus scan —
    // and the SQL function resolves to the native codegen'd expression
    assert(plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("graft_dot"), plan)
    // rank<=k over dot is pushed to a per-partition group limit before
    // the shuffle (WindowGroupLimit) — the top-k never sorts the corpus
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("ann_ivf_build/ann_ivf_trained/emb_kmeans: assignment never exchanges the corpus") {
    // The VERDICT r8 `weak` family: centroid assignment used to rank a
    // corpus-wide window partitioned by vec_id — an Exchange of the whole
    // corpus WITH embedding payloads, once per pass (×(iters+1) when
    // training). The native argmax expression (functions/NearestCentroids)
    // makes assignment map-only: the ONLY hash Exchange allowed in the
    // whole IVF build+probe plan is the per-QUERY ranking window (over
    // candidate rows already stripped of embeddings), and emb_kmeans'
    // only hash Exchange is the (cid, dim) stats aggregation.
    // ann_ivf_durable shares the probe plan exactly — the prebuilt
    // centroids change WHERE they come from (one sidecar read), never
    // the probe's shape
    for (q <- Seq("ann_ivf_build", "ann_ivf_trained", "ann_ivf_durable")) {
      val plan = executedPlan(SparkEntry.queries(q)(spark, sfDir))
      val hashEx = "Exchange hashpartitioning\\(([a-zA-Z_0-9]+)#".r
        .findAllMatchIn(plan).map(_.group(1)).toSet
      assert(hashEx == Set("qid"),
        s"$q: the only hash Exchange must be the per-query rank window, " +
          s"got partitions on $hashEx:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(vec_id"),
        s"$q: corpus assignment must not shuffle on vec_id:\n$plan")
      // the probe-side top-k group-limits before that shuffle
      assert(plan.contains("WindowGroupLimit"), plan)
      assert(plan.contains("nearest_centroids"), plan)
    }
    val km = executedPlan(SparkEntry.queries("emb_kmeans")(spark, sfDir))
    assert(!km.contains("Exchange hashpartitioning(vec_id"),
      s"emb_kmeans: assignment must not shuffle the corpus:\n$km")
    assert(km.contains("nearest_centroids"), km)
    // and the probe-side top-k group-limits in EVERY IVF probe query —
    // a regression to a global bucket sort would show as the missing
    // WindowGroupLimit (previously pinned only for ann_sql)
    for (q <- Seq("ann_ivf", "ann_ivf_probe2")) {
      val p = executedPlan(SparkEntry.queries(q)(spark, sfDir))
      assert(p.contains("WindowGroupLimit"),
        s"$q: the rank<=k must group-limit before the shuffle:\n$p")
    }
  }

  test("ann_pq: encode is map-only; only the per-query rank window exchanges") {
    // PQ's scale contract: the corpus-side work is ONE map pass (native
    // per-subspace argmax + LUT lookups) — the only hash Exchange is the
    // per-query rank window over (qid, vec_id, adot) rows, and the LUT
    // side broadcasts
    for (q <- Seq("ann_pq", "ann_pq_rerank", "ann_ivfpq")) {
      val plan = executedPlan(SparkEntry.queries(q)(spark, sfDir))
      val hashEx = "Exchange hashpartitioning\\(([a-zA-Z_0-9]+)#".r
        .findAllMatchIn(plan).map(_.group(1)).toSet
      assert(hashEx == Set("qid"),
        s"$q: only the rank window may hash-exchange, got $hashEx:\n$plan")
      assert(plan.contains("BroadcastExchange"), plan)
      assert(plan.contains("nearest_centroids"), plan)
      assert(plan.contains("WindowGroupLimit"), plan)
    }
    // the durable probe additionally must NOT re-encode: scoring reads
    // the STORED code table, so the only nearest_centroids call left in
    // the plan is the query-routing probe over the broadcast-small query
    // set (the inline builds carry m-subspace encode + corpus assignment
    // on top of it)
    {
      val plan = executedPlan(
        SparkEntry.queries("ann_ivfpq_durable")(spark, sfDir))
      val hashEx = "Exchange hashpartitioning\\(([a-zA-Z_0-9]+)#".r
        .findAllMatchIn(plan).map(_.group(1)).toSet
      assert(hashEx == Set("qid"),
        s"ann_ivfpq_durable: only the rank window may hash-exchange, " +
          s"got $hashEx:\n$plan")
      assert(plan.contains("BroadcastExchange"), plan)
      assert(plan.contains("WindowGroupLimit"), plan)
      val encodes = "nearest_centroids".r.findAllMatchIn(plan).size
      assert(encodes == 1,
        s"ann_ivfpq_durable: expected ONE nearest_centroids (query " +
          s"routing only — no corpus re-encode), got $encodes:\n$plan")
    }
  }

  test("q_exists_subquery decorrelates to ONE anti join") {
    val df = SparkEntry.queries("q_exists_subquery")(spark, sfDir)
    val logical = df.queryExecution.optimizedPlan.toString
    // the correlated NOT EXISTS (equality + cross-table inequality) must
    // become a single LEFT ANTI join carrying the inequality — a naive
    // engine re-probes orders per customer row
    assert(logical.contains("LeftAnti"), logical)
    assert(!logical.toLowerCase.contains("exists"), logical)
    val plan = executedPlan(df)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_stats_agg is one scan, one exchange, map-side partial") {
    val plan = executedPlan(SparkEntry.queries("q_stats_agg")(spark, sfDir))
    // five exact power sums + count ride ONE partial/final HashAggregate
    // pair around a single 3-group exchange: at 100 TB the wire carries
    // 6 longs per (partition, group), never rows
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert("HashAggregate".r.findAllIn(plan).size == 2, plan)
    assert(plan.indexOf("HashAggregate") < plan.indexOf("Exchange") ||
      plan.lastIndexOf("HashAggregate") > plan.lastIndexOf("Exchange"),
      s"expected a partial aggregate below the exchange:\n$plan")
  }

  test("q_temporal_join: fact filter pushed, no cartesian, one version window") {
    val df = SparkEntry.queries("q_temporal_join")(spark, sfDir)
    val plan = executedPlan(df)
    // the fact slice reaches its scan; the versioned dim is ONE window
    assert(plan.contains("PushedFilters"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the version read is rankedWithCount: Spark splits row_number
    // (ordered) and count (frame-only) into two Window operators, but
    // both partition by the key — ONE key exchange feeds the pair, and
    // that single shuffle is the claim that matters at scale
    assert("Window \\[".r.findAllIn(plan).size == 2, plan)
    assert("hashpartitioning\\(k#".r.findAllIn(plan).size == 1,
      s"expected ONE key exchange feeding both version windows:\n$plan")
  }

  test("q_heavy_hitters recount: pruned scan, map-side partials, no cartesian") {
    val df = SparkEntry.queries("q_heavy_hitters")(spark, sfDir)
    val plan = executedPlan(df)
    // the item column is DERIVED (CASE over o_orderkey), so the ≤k IN
    // filter evaluates in the codegen'd scan stage rather than pushing to
    // parquet (a stored hot-key column would push); what must hold at
    // scale: the scan reads ONLY the one source column, the recount
    // aggregates map-side before its ≤k-group exchange, and nothing
    // cross-joins
    assert("ReadSchema: [^\\n]*o_orderkey".r.findFirstIn(plan).isDefined &&
      !plan.contains("o_totalprice"),
      s"expected the recount scan pruned to o_orderkey:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregation:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("changesBetween pushes the version range to the scan (CDC prunes)") {
    val wh = Files.createTempDirectory("graft_audit_cdc_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    cat.createTable("t", "k", rows)
    cat.commit("t", graft.core.Txn.empty
      .update(col("k") % 2 === 0, Map("price" -> (col("price") + 1.0))))
    cat.commit("t", graft.core.Txn.empty.delete(col("k") % 7 === 0))
    val plan = executedPlan(cat.changesBetween("t", 1, 2))
    // the (from, to] range must reach parquet as pushed filters so tail
    // files wholly outside it skip by footer min-max — the property that
    // makes a CDC catch-up read commits, not the table
    assert(plan.contains("GreaterThan(_ver,1)") &&
      plan.contains("LessThanOrEqual(_ver,2)"),
      s"expected the _ver range pushed to the scan:\n$plan")
    // and no window/join: the feed is a stateless projection
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
  }

  test("pipe_stratified ranks per (partition, stratum), never per stratum") {
    val df = SparkEntry.queries("pipe_stratified")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val winSpecs = "Window \\[[^\\]]*row_number[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    // the data-sized rank window must key on _pid (+ the stratum) — a
    // lang-only spec funnels each language onto ONE reducer however
    // large the cluster (the few-strata trap Layout.topNPerGroup avoids)
    assert(winSpecs.nonEmpty && winSpecs.exists(_.contains("_pid")),
      s"expected the rank window keyed by _pid:\n$plan")
  }

  test("ann_filtered pushes the metadata predicate into the corpus scan") {
    val plan = executedPlan(SparkEntry.queries("ann_filtered")(spark, sfDir))
    // pre-filter strategy: the label predicate must reach the parquet
    // reader (pushed filter + row-group stat prune) — at 100 TB the
    // engine reads label-matching row groups only and never scores an
    // excluded vector
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(label,3\\)".r
      .findFirstIn(plan).isDefined,
      s"expected EqualTo(label,3) pushed to the corpus scan:\n$plan")
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("text_bm25 / ann_hybrid take top-k by heap, never a global sort") {
    for (q <- Seq("text_bm25", "ann_hybrid")) {
      val plan = executedPlan(SparkEntry.queries(q)(spark, sfDir))
      // the corpus-sized rank is TakeOrderedAndProject (per-partition
      // heaps, k rows to the driver); a global Sort would funnel every
      // scored doc through one reducer
      assert(plan.contains("TakeOrderedAndProject"), s"$q:\n$plan")
      // only the k-row ranked tail may sort (the window over ≤k rows)
      assert("Exchange SinglePartition".r.findAllIn(plan).size <= 2,
        s"$q: corpus-sized single-partition exchange:\n$plan")
    }
  }

  test("ann_matryoshka: both stages hash-exchange only the per-query window") {
    // stage 1 (prefix shortlist) and stage 2 (exact re-rank) each rank
    // per query; the corpus joins the broadcast query/shortlist sides —
    // no corpus-keyed Exchange anywhere
    val plan = executedPlan(SparkEntry.queries("ann_matryoshka")(spark, sfDir))
    val hashEx = "Exchange hashpartitioning\\(([a-zA-Z_0-9]+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(hashEx == Set("qid"),
      s"ann_matryoshka: only the rank windows may hash-exchange, got $hashEx:\n$plan")
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("Exchange hashpartitioning(vec_id"), plan)
  }

  test("emb_project is map-only: zero Exchange, scan pruned to 2 columns") {
    val df = SparkEntry.queries("emb_project")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Exchange"),
      s"random projection must not shuffle:\n$plan")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .get.group(1)
    val cols = read.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("vec_id", "embedding"), s"scan reads: $cols")
  }

  test("q_gini: one range exchange over facts; hash exchanges touch group rows only") {
    val plan = executedPlan(SparkEntry.queries("q_gini")(spark, sfDir))
    // the fact table crosses the wire exactly once — the range
    // partitioning that defines local ranks; the decomposition means
    // no join back, so no second fact-sized exchange can exist
    assert("Exchange rangepartitioning".r.findAllIn(plan).size == 1, plan)
    // remaining hash exchanges carry per-(partition, group) aggregate
    // rows (status-keyed), never order rows
    val hashEx = "Exchange hashpartitioning\\(([a-zA-Z_0-9]+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(hashEx.subsetOf(Set("status", "pid")), s"got $hashEx:\n$plan")
    assert(!plan.contains("Join"), s"decomposition must not join back:\n$plan")
  }

  test("q_unpivot melts above the aggregate: Expand over group-cardinality rows") {
    val plan = executedPlan(SparkEntry.queries("q_unpivot")(spark, sfDir))
    assert(plan.contains("Expand"), plan)
    // the only hash Exchange is the flag aggregate; the Expand fans out
    // AFTER reduction (3 groups × 3 measures), never the fact table
    val hashEx = "Exchange hashpartitioning\\(([a-zA-Z_0-9]+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    // the exchange keys on the aggregate's input attribute (pre-alias)
    assert(hashEx == Set("l_returnflag"), s"got $hashEx:\n$plan")
    // Expand must sit ABOVE the final aggregate (printed before it)
    assert(plan.indexOf("Expand") < plan.indexOf("HashAggregate"), plan)
  }

  test("q_copurchase: keyed self-join, heap top-20, never a global sort") {
    val plan = executedPlan(SparkEntry.queries("q_copurchase")(spark, sfDir))
    // the pair join is an EQUI-join on the order key (p1 < p2 rides as a
    // join condition, never a cartesian fan-out over the table)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the global top-20 over pair counts is TakeOrderedAndProject
    // (per-partition heaps, 20 rows to the driver) — a global Sort of
    // the pair table would funnel |pairs| rows through one reducer
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("dedup_keep_best: per-cluster argmax aggregates, no corpus window") {
    val plan = executedPlan(SparkEntry.queries("dedup_keep_best")(spark, sfDir))
    // the keeper pick is associative min_by over (-len, doc_id) — partial
    // runs map-side, the cluster shuffle carries one candidate per
    // (cluster, partition); a row_number window would sort whole clusters
    // on single reducers
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_min_by"), plan)
  }

  test("q_markov: user-keyed window + group-cardinality joins, no fact funnel") {
    val plan = executedPlan(SparkEntry.queries("q_markov")(spark, sfDir))
    // successor pairing parallelizes across users; the transition counts
    // and row totals are |types²|-sized — nothing corpus-sized may ever
    // pass through a single partition
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_zscore: stats broadcast back, facts never hash-exchanged") {
    val plan = executedPlan(SparkEntry.queries("q_zscore")(spark, sfDir))
    // the scoring join must be broadcast (|types| rows onto the facts)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // top-20 via per-partition heaps, never a global sort of the facts
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the only hash Exchange is the per-type stats aggregation — the
    // fact side reaches the broadcast join unshuffled
    val hashEx = "Exchange hashpartitioning\\(([a-zA-Z_0-9]+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(hashEx == Set("event_type"), s"got $hashEx:\n$plan")
  }

  test("q_rfm: ranks in value buckets; cuts broadcast back onto metrics") {
    val plan = executedPlan(SparkEntry.queries("q_rfm")(spark, sfDir))
    // each metric's quintile cuts rank inside VALUE buckets (withBucket
    // — the r9 determinism fix; no sampled range exchange anywhere),
    // never a global-order window over the customer table
    assert(!plan.contains("rangepartitioning"), plan)
    assert("hashpartitioning\\(pid#\\d+".r.findFirstIn(plan).isDefined, plan)
    // the three 1-row cut tables and the per-partition offsets reach the
    // metric rows by broadcast — segment assignment is map-only
    assert("BroadcastExchange".r.findAllIn(plan).nonEmpty, plan)
    // single-partition exchanges may only carry the ≤nPart histogram
    // rows (the offset windows), never customer rows: the pattern below
    // matches an Exchange feeding a Window directly over a scan-sized
    // input — absent means every such window reads aggregated rows
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("emb_cov: map-side pair expansion; shuffles carry only dim groups") {
    val plan = executedPlan(SparkEntry.queries("emb_cov")(spark, sfDir))
    // the upper-triangle products explode map-side (Generate below the
    // partial aggregate); the only hash exchanges key on the triangular
    // position / dim groups (r15: `pos` replaced the per-pair (i, j)
    // struct — same |D²| groups, primitive array expansion) — the
    // corpus is never exchanged
    assert(plan.contains("Generate"), plan)
    val hashEx = "Exchange hashpartitioning\\(([a-zA-Z_0-9]+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(hashEx.subsetOf(Set("pos", "i", "j", "dim")), s"got $hashEx:\n$plan")
    assert(plan.contains("partial_sum"), plan)
  }

  test("r9 sixth-session additions hold their plan shapes") {
    // q_attribution: ONE user-keyed window; no product joins. (Spark
    // additionally semi-join-prunes non-purchasing users before the
    // window — an optimizer win we accept, not require.)
    val pa = executedPlan(SparkEntry.queries("q_attribution")(spark, sfDir))
    assert("Window ".r.findAllIn(pa).size == 1, pa)
    assert(pa.contains("hashpartitioning(user_id"), pa)
    assert(!pa.contains("CartesianProduct"), pa)
    // q_diversity: pure two-level aggregation — no window anywhere, and
    // the top-20 is a per-partition heap, never a global sort
    val pd = executedPlan(SparkEntry.queries("q_diversity")(spark, sfDir))
    assert(!pd.contains("Window"), pd)
    assert(pd.contains("TakeOrderedAndProject"), pd)
    // q_acf / q_bollinger: the lag/window membership explodes off the
    // |days| aggregate — NO row-level window over the fact
    for (q <- Seq("q_acf", "q_bollinger")) {
      val p = executedPlan(SparkEntry.queries(q)(spark, sfDir))
      assert(!p.contains("Window"), s"$q grew a window:\n$p")
    }
    // q_skyline: offsets arrive by broadcast; pids are value-derived
    // columns (withBucket — zero sampled range exchanges), and the
    // frontier check is never a merge join or product
    val ps = executedPlan(SparkEntry.queries("q_skyline")(spark, sfDir))
    assert(!ps.contains("rangepartitioning"), ps)
    assert(!ps.contains("SortMergeJoin") && !ps.contains("CartesianProduct"),
      ps)
    // q_mad (collapsed rankValue): the machinery runs on counted values —
    // running sums, no row_number; the fact reaches it through a
    // map-combined partial aggregate, and bucketing is data-derived
    val pm = executedPlan(SparkEntry.queries("q_mad")(spark, sfDir))
    assert(!pm.contains("row_number"), pm)
    assert(!pm.contains("rangepartitioning") && pm.contains("partial_count"),
      pm)
    // graph/verify joins stay key joins — never an unkeyed product of
    // data-sized inputs (the broadcast nested-loop joins q_triangles
    // DOES carry are the 1-row scalar-total crossJoins; a
    // CartesianProduct would mean a data×data pairing escaped)
    for (q <- Seq("q_triangles", "dedup_edit")) {
      val p = executedPlan(SparkEntry.queries(q)(spark, sfDir))
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("q_mview_route_minmax serves min/max from the view — the fact is never scanned") {
    val p = executedPlan(SparkEntry.queries("q_mview_route_minmax")(spark, sfDir))
    // the routed read scans the VIEW's lineage (its maintained extremum
    // columns appear as scan output); the fact table contributes nothing
    assert(p.contains("minc_totalprice") && p.contains("maxc_totalprice"), p)
    // every scan is of the VIEW (WindowProbe may add candidate-probe
    // scans of the same files): the fact's raw double column never
    // appears in any scan schema
    assert(!p.contains("totalprice:double"), p)
    // no aggregation of fact rows anywhere: the only aggregates permitted
    // are none — the routed plan is scan → snapshot window → project
    assert(!p.contains("partial_sum") && !p.contains("partial_min") &&
      !p.contains("partial_max"), p)
  }

  test("equi-depth withBucket: sample is a heap top-k, never a global sort") {
    // the boundary sample inside the rank family's bucketing is
    // TakeOrderedAndProject over the collapsed values (per-partition
    // heaps, sampleK rows) — and the family stays free of sampled range
    // exchanges (the r9 determinism rule)
    val p = executedPlan(SparkEntry.queries("q_percentile")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("q_triangles dedupes its repeated pair-join subtrees via ReusedExchange") {
    // `e` (the lineitem pair self-join) feeds deg/ed/edges and `ori`
    // feeds the adjacency build plus two join sides (r15 intersect
    // form): without exchange reuse the most expensive stage would run
    // 3× (an explicit checkpoint benched SLOWER than reuse at sf0.1 —
    // 5.8s vs 5.5s — so reuse IS the design and this pin is what keeps
    // it from silently regressing)
    val p = executedPlan(SparkEntry.queries("q_triangles")(spark, sfDir))
    assert(p.contains("ReusedExchange"), p)
  }

  test("ann_radius: routed queries broadcast onto the bucketed corpus " +
      "— no corpus-wide shuffle join (r14)") {
    val p = executedPlan(SparkEntry.queries("ann_radius")(spark, sfDir))
    // the |queries|·nProbe routed side must be the broadcast build side;
    // a sort-merge or nested-loop here means the corpus (embedding
    // payloads included) shuffles per batch — the at-scale cliff
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("NestedLoop"), p)
  }

  test("q_lateral decorrelates: hash join + WindowGroupLimit, filter " +
      "pushed to the scan — never a per-row nested loop (r14)") {
    val p = executedPlan(SparkEntry.queries("q_lateral")(spark, sfDir))
    // the correlated ORDER BY .. LIMIT subquery must rewrite to the
    // top-n-per-group shape: rank-limit pushdown before the full window
    assert(p.contains("WindowGroupLimit"), p)
    // joined, not looped — a BroadcastNestedLoopJoin/CartesianProduct
    // here is the O(|customer|·|orders|) cliff at scale
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    // the lateral body's price predicate reaches the orders scan
    assert("PushedFilters: \\[[^\\]]*GreaterThan\\(o_totalprice".r
      .findFirstIn(p).isDefined, p)
  }

  test("sql_asof_join desugars to equi joins — never a nested-loop " +
      "domain join (r14 optimization round)") {
    // the r14.0 correlated-LATERAL desugar decorrelated into a
    // BroadcastNestedLoopJoin over |distinct ts| × |events| (~5·10⁹ rows
    // at sf0.1, 28 GB of sort spill, unfinishable) because only the
    // inequality reached the domain join. The rewritten desugar keys
    // every join on the ON equalities; this pin is the regression guard.
    val p = executedPlan(SparkEntry.queries("sql_asof_join")(spark, sfDir))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    // the equalities must be real join keys (hash or sort-merge), and the
    // backward pick stays a rank-1 cut (WindowGroupLimit pushdown)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("snapshot latest read is ONE window pass — no count pass, no " +
      "rank-rewrite map sort (r14 optimization round)") {
    val wh = Files.createTempDirectory("graft_audit_snap1_").toString
    val cat = new Catalog(spark, wh, autoCompact = false)
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    cat.createTable("t", "k", rows)
    cat.commit("t", graft.core.Txn.empty
      .update(col("k") % 2 === 0, Map("price" -> (col("price") + 1.0))))
    val p = executedPlan(cat.getTable("t").snapshot)
    // exactly one WindowExec: the max(_ver)-per-key pick. Two would mean
    // the dead count pass is back; a WindowGroupLimit would mean the
    // rank-filter spelling crept back in and re-enabled the
    // InferWindowGroupLimit map-side sort measured ×2.5–4.6 slower at
    // 100× (OPTIMIZATION_r14.md §2).
    val windows = "(?m)^\\s*[+:]?-* ?Window ".r.findAllIn(p).size
    assert(windows == 1, s"expected exactly 1 Window pass:\n$p")
    assert(!p.contains("WindowGroupLimit"), p)
    // deep relative reads keep the counted clamp — and stay correct
    val prev = cat.getTable("t").asOfRelative(-1)
    assert(prev.where(col("k") === 2L).select(col("price")).collect()
      .head.getDouble(0) === rows.where(col("k") === 2L)
      .select(col("price")).collect().head.getDouble(0))
  }
}
