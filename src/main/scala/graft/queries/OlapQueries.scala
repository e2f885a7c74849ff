package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact

/**
 * OLAP query surface (SURVEY.md §2 #22–28): the analytics workloads the
 * engine must run beyond the reference's point/range L-Store API.
 *
 * Determinism: every double aggregate goes through exact scaled-long
 * arithmetic (see [[graft.functions.Exact]]) so distributed Spark sums
 * hash-match the single-node DuckDB oracle bit-for-bit: 2dp money sums as
 * integer cents (scale-4/6 integers for revenue/charge products), and the
 * final divide down to double is correctly rounded — the same double the
 * oracle's exact DECIMAL sum produces when cast.
 *
 * Scale: dimension sides of joins are explicitly `broadcast(...)`; fact-fact
 * joins shuffle on their join key and rely on AQE for skew/coalesce. Window
 * queries partition by a real key (never a global window over big data).
 */
object OlapQueries {

  /**
   * Exact money arithmetic as scaled longs (see [[Exact]]): price, discount
   * and tax are 2dp doubles, so `price*(1-disc)` is an exact scale-4 integer
   * and `price*(1-disc)*(1+tax)` an exact scale-6 integer. Long sums are
   * associative AND primitive (no per-row BigDecimal), and the final
   * `/ 10^scale` double division is correctly rounded — bit-identical to
   * the DuckDB oracle's decimal sum cast while the scaled sum < 2^53
   * (the invariant every DOUBLE output obeys anyway, SURVEY §4).
   */
  private def revenueC4: Column = // scale-4 long: cents * (100 - disc_cents)
    Exact.cents(col("l_extendedprice")) * (lit(100L) - Exact.cents(col("l_discount")))

  private def chargeC6: Column = // scale-6 long
    revenueC4 * (lit(100L) + Exact.cents(col("l_tax")))

  /**
   * Bucketed fact tables for [[graft.ops.Layout.bucketedJoin]], built once
   * per sf dir into the session catalog: both sides bucket+sort by the
   * shared join key at WRITE time, so the fact-fact join (and the
   * aggregation on the same key above it) plans with ZERO Exchange — the
   * at-scale payoff of paying one shuffle at ingest instead of two per
   * nightly join. 8 buckets here; a 100 TB deployment sizes buckets to
   * executor count.
   */
  private val bucketCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  private def bucketedTables(s: SparkSession, d: String): (String, String) = {
    // the cache stores NAMES registered in a session catalog, but the map
    // is JVM-global: if the session (and its catalog) was stopped and
    // recreated since the build, the cached names dangle — verify they
    // still resolve in THIS session's catalog before reuse, else rebuild
    // (writeBucketed drops stale tables/locations, so a rebuild is safe)
    bucketCache.get(d)
      .filter { case (li, ord) =>
        s.catalog.tableExists(li) && s.catalog.tableExists(ord) }
      .getOrElse {
        val built = buildBucketed(s, d)
        bucketCache.put(d, built)
        built
      }
  }

  private def buildBucketed(s: SparkSession, d: String): (String, String) = {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val li = s"graft_bkt_lineitem_$tag"
      val ord = s"graft_bkt_orders_$tag"
      graft.ops.Layout.writeBucketed(
        Tables(s, d, "lineitem").select(col("l_orderkey").as("orderkey"),
          col("l_extendedprice"), col("l_quantity")),
        li, "orderkey", 8)
      graft.ops.Layout.writeBucketed(
        Tables(s, d, "orders").select(col("o_orderkey").as("orderkey"),
          col("o_orderstatus")),
        ord, "orderkey", 8)
      (li, ord)
  }

  /** Conf-scoped clone for [[q_bloom_join]] — one per parent session, built
    * lazily and reused (same SparkContext, same extensions; see scaladoc on
    * the query for why each conf is set). */
  private val bloomCache =
    // weak parent keys, like Tuning.scaled / StreamOps.streamSessions: a
    // clone lives exactly as long as its parent session is reachable
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SparkSession]())

  private def bloomSession(s: SparkSession): SparkSession =
    bloomCache.computeIfAbsent(s, _ => {
      val c = s.newSession()
      // newSession() builds its state from the shared INITIAL options, not
      // the parent's runtime conf — when the parent is a Tuning clone, its
      // size-aware shuffle width must be carried over explicitly or the
      // composition silently reverts to the default width (and the pruned
      // fact join re-acquires the spill the width lever removes)
      val width = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
      s.conf.getOption(width).foreach(c.conf.set(width, _))
      c.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // the dim is a filtered MONTH of orders — selective by construction
      // at any SF, but its plan-size estimate crosses the default 10 MB
      // creation threshold around 1000× and the rule would silently stop
      // building the bloom exactly where pre-shuffle pruning pays most;
      // the cap still bounds the filter the workers must evaluate
      c.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "256MB")
      c.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exchange-free fact-fact join over bucketed tables: lineitem ⋈ orders
    // on the bucketed key, aggregated on the SAME key — bucketing satisfies
    // the distribution requirement of join AND aggregation, so the whole
    // plan runs without a single shuffle (PlanAuditSpec pins zero
    // Exchange). The oracle is a plain join: bucketing is layout, never
    // semantics.
    "q_bucketed_join" -> { (s, d) =>
      val (li, ord) = bucketedTables(s, d)
      graft.ops.Layout.bucketedJoin(s, li, ord, "orderkey")
        .where(col("orderkey") % 50 === 0)
        .groupBy(col("orderkey"))
        .agg(count(lit(1)).as("n_items"),
             Exact.sumMoney(col("l_extendedprice")).as("sum_price"),
             min(col("o_orderstatus")).as("status"))
    },

    // TPC-H Q1 shape: single scan, map-side partial agg, 4-group result.
    "q1_agg" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // Aggregate exactly (scaled longs), EMIT DOUBLE. Two driver
          // lessons stack here:
          //  r1: decimal→double is engine-identical only while the scaled
          //      integer stays < 2^53 (sum_disc_price at its natural scale 8
          //      crossed that at sf0.1 → 1-ulp split).
          //  r2: wide-DECIMAL output columns never survive the driver's
          //      comparator at all — even bit-identical DECIMAL(38,2) values
          //      hashed differently on the two sides (all 5 red r2 rows were
          //      exactly the 5 queries with DECIMAL in the output schema).
          // So: sum at the TRUE scale (disc_price has 4 fractional digits =
          // money 2 + discount 2; charge 6; qty/price 2), reduce charge to
          // scale 4 half-up (= oracle ROUND), and divide down to double —
          // correctly rounded while the scaled int < 2^53, which the
          // largest q1 group's scale-4 sum crosses at sf≈18 (measured
          // extrapolation from sf0.01); beyond that the long→double step
          // can split from the oracle by 1 ulp.
          Exact.sumMoney(col("l_quantity")).as("sum_qty"),
          Exact.sumMoney(col("l_extendedprice")).as("sum_base_price"),
          (sum(revenueC4) / 1e4).as("sum_disc_price"),
          sum(chargeC6).as("_charge6"),
          Exact.sumMoney(col("l_discount")).as("_sum_disc"),
          count(lit(1)).as("count_order"))
        // Averages reuse the exact sums: same double operands as the
        // oracle's CAST(SUM AS DOUBLE)/COUNT(*), one IEEE division each.
        // Charge rounds scale-6 → scale-4 half-away-from-zero in integer
        // space, sign-aware ((x + sign(x)*50) div 100; div truncates toward
        // zero) so it matches DuckDB's ROUND for either sign — TPC-H sums
        // are positive, but the helper shouldn't depend on that.
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
          (expr("(_charge6 + if(_charge6 < 0, -50L, 50L)) div 100") / 1e4).as("sum_charge"),
          (col("sum_qty") / col("count_order")).as("avg_qty"),
          (col("sum_base_price") / col("count_order")).as("avg_price"),
          (col("_sum_disc") / col("count_order")).as("avg_disc"),
          col("count_order"))
    },

    // TPC-H Q3 shape: broadcast the filtered customer dim, shuffle-join the
    // two facts on orderkey, top-10 with a full deterministic tiebreak.
    "q3_join_topn" -> { (s, d) =>
      val cust = Tables(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
      val ord = Tables(s, d, "orders").where(col("o_orderdate") < lit("1998-06-01"))
      val li = Tables(s, d, "lineitem").where(col("l_shipdate") > lit("1998-06-01"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg((sum(revenueC4) / 1e4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .select(col("l_orderkey").as("orderkey"),
                col("o_orderdate").cast("date").as("orderdate"),
                col("revenue"))
    },

    // TPC-H Q5 shape: 6-way join; region/nation/supplier broadcast (true
    // dims at any SF), customer/orders/lineitem shuffle on their keys.
    // The fact shuffle is the one data-proportional full-table shuffle in
    // the OLAP surface, so its width scales with the fact bytes
    // (ops/Tuning.scala: 1000× measured 167s → 37s; same session — and
    // same plan — back at test SF).
    "q5_join_multi" -> { (s0, d) =>
      val s = graft.ops.Tuning.scaledSession(s0, d,
        Seq("lineitem", "orders", "customer"))
      val asia = broadcast(
        Tables(s, d, "nation").join(
          broadcast(Tables(s, d, "region").where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey")))
      val ord = Tables(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01") &&
               col("o_orderdate") < lit("1997-01-01"))
      Tables(s, d, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(asia, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        // Whole-nation revenue at its natural scale 8 crosses the 2^53
        // scaled-int bound around sf1 — sum at the TRUE scale 4 (exact:
        // money 2dp × discount 2dp), which holds the invariant to sf≈100
        // (q1 lesson + the r2 no-decimal-output rule).
        .agg((sum(revenueC4) / 1e4).as("revenue"))
    },

    // Rank + running sum per customer — window partitioned by a real key.
    "q_window_rank" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables(s, d, "orders")
        .where(col("o_custkey") < 200)
        .select(
          col("o_custkey").as("custkey"),
          col("o_orderkey").as("orderkey"),
          row_number().over(w).cast("bigint").as("rnk"),
          (sum(Exact.cents(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
             / 100.0).as("run_sum"))
    },

    // Set operations (INTERSECT / EXCEPT): repeat customers of 1996∩1997
    // minus anyone active in 2001 — Spark plans these as aggregate-dedup +
    // semi/anti joins (shuffle on the key, no sort, no cartesian), the
    // right distributed shape; nothing here is a driver-side set.
    "q_set_ops" -> { (s, d) =>
      def buyers(yr: Int) = Tables(s, d, "orders")
        .where(col("o_orderdate") >= lit(s"$yr-01-01") &&
               col("o_orderdate") < lit(s"${yr + 1}-01-01"))
        .select(col("o_custkey").as("custkey"))
      buyers(1996).intersect(buyers(1997)).except(buyers(2001))
    },

    // Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL): customer
    // ORDER MULTIPLICITIES intersected across years, minus 2001 activity —
    // a customer with 3 orders in 1996 and 2 in 1997 contributes min(3,2)
    // rows, which the dedup-based q_set_ops cannot express. Spark plans
    // these as count-aggregates + a generate replication on the key (one
    // shuffle, no sort, no cartesian) — multiplicity arithmetic, never
    // row-by-row matching.
    "q_set_ops_all" -> { (s, d) =>
      def bag(yr: Int) = Tables(s, d, "orders")
        .where(col("o_orderdate") >= lit(s"$yr-01-01") &&
               col("o_orderdate") < lit(s"${yr + 1}-01-01"))
        .select(col("o_custkey").as("custkey"))
      bag(1996).intersectAll(bag(1997)).exceptAll(bag(2001))
    },

    // Offset window functions (lag/lead/ntile) — the remaining window
    // class after rank/running-sum: per-key partitions with a total
    // order, so results are deterministic and the window never goes
    // global (one key-partitioned shuffle, like q_window_rank).
    "q_lag_lead" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables(s, d, "orders")
        .where(col("o_custkey") < 100)
        .select(
          col("o_custkey").as("custkey"),
          col("o_orderkey").as("orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          ntile(4).over(w).cast("bigint").as("quartile"))
    },

    // Relative-rank window family (percent_rank / cume_dist): where a
    // price sits WITHIN its status group, as exact rational positions.
    // Deterministic under ties by definition (percent_rank = (rank-1)/
    // (n-1) uses the tie-sharing rank; cume_dist counts peers), and each
    // output is ONE IEEE division of two exact integers — identical
    // doubles in both engines, no decimal detour needed. Same partitioned
    // single-shuffle shape as q_window_rank.
    "q_window_cume" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))
      Tables(s, d, "orders")
        .where(col("o_orderkey") <= 3000L)
        .select(col("o_orderkey").as("orderkey"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("totalprice"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
    },

    // Exact distinct aggregation (the approximate twin — HLL++ via
    // approx_count_distinct — is asserted in ScalaTest, not oracled:
    // sketches are engine-specific by construction).
    "q_distinct_agg" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
             countDistinct(col("o_orderstatus")).as("n_status"),
             count(lit(1)).as("n_orders"))
    },

    // As-of join: for each sampled event, the latest order of that user at
    // or before the event date (events carry 2024 timestamps; a
    // deterministic event_id→1995-2001 date remap puts them in orders'
    // era). Equi-join on user, then per-event window keeps row 1 —
    // the compose-from-existing-ops form; partitioning is by event, so the
    // heavy side shuffles once on the equi key.
    "q_asof_join" -> { (s, d) =>
      val ev = Tables(s, d, "events")
        .where(col("event_id") % 20 === 0)
        .select(col("event_id"), col("user_id"),
          date_add(lit("1995-01-01").cast("date"),
                   (col("event_id") % 2400).cast("int")).as("event_date"))
      val ord = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
                col("o_orderdate").cast("date").as("o_date"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("o_date").desc, col("o_orderkey").desc)
      ev.join(ord, col("user_id") === col("o_custkey") &&
                   col("o_date") <= col("event_date"))
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_date"),
                col("o_orderkey").as("matched_order"),
                col("o_date").as("matched_date"))
    },

    // As-of NEAREST (r10): the feature-join variant that matches the
    // closest order on EITHER side of the event date (backward-only
    // as-of is q_asof_join) — sensor-fusion / feature-store alignment.
    // Total tiebreak (|gap| asc, date asc, key asc) keeps both engines
    // on the same row; same cost class as q_asof_join: a user-keyed
    // join then one per-event rank window.
    "q_asof_nearest" -> { (s, d) =>
      val ev = Tables(s, d, "events")
        .where(col("event_id") % 20 === 0)
        .select(col("event_id"), col("user_id"),
          date_add(lit("1995-01-01").cast("date"),
                   (col("event_id") % 2400).cast("int")).as("event_date"))
      val ord = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
                col("o_orderdate").cast("date").as("o_date"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(abs(datediff(col("o_date"), col("event_date"))).asc,
          col("o_date").asc, col("o_orderkey").asc)
      ev.join(ord, col("user_id") === col("o_custkey"))
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_date"),
                col("o_orderkey").as("matched_order"),
                col("o_date").as("matched_date"),
                datediff(col("o_date"), col("event_date")).as("gap_days"))
    },

    // ROLLUP grouping sets: subtotal + grand-total rows in one pass —
    // Spark expands the sets map-side, still a single shuffle.
    "q_rollup" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             Exact.sumMoney(col("l_quantity")).as("sum_qty"))
    },

    // CUBE grouping sets: all 4 subtotal combinations in one pass (the
    // rollup's superset — same single shuffle, map-side set expansion).
    "q_cube" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             Exact.sumMoney(col("l_quantity")).as("sum_qty"))
    },

    // Explicit GROUPING SETS — the general form rollup/cube specialize:
    // two INDEPENDENT subtotal breakdowns (by flag, by status) in one
    // pass that neither rollup (hierarchical) nor cube (all 4 combos)
    // expresses. Same execution shape as rollup/cube: map-side Expand,
    // one shuffle.
    "q_grouping_sets" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             Exact.sumMoney(col("l_quantity")).as("sum_qty"))
    },

    // RANGE-frame moving aggregate: per-user trailing-7-day spend over
    // event TIME — the frame is a value range (gaps and ties by ts), which
    // the ROWS-frame family (q_lag_lead) cannot express. The user predicate
    // pushes below the window to the scan; the window shuffles only on
    // user_id. Long-cents sum because each output row sums a DIFFERENT
    // subset: double addition grouping differs between engines (segment
    // tree vs sliding accumulation), integer cents are exact in both.
    "q_moving_agg" -> { (s, d) =>
      val week = 7L * 24 * 3600 * 1000 * 1000 * 1000
      // µs-truncated ns for BOTH the frame key and the output: DuckDB
      // parses parquet TIMESTAMP(NANOS) at µs precision, so frame
      // boundaries must be decided on the µs grain in both engines.
      val tsUs = col("ts") - col("ts") % 1000
      val w = Window.partitionBy(col("user_id")).orderBy(tsUs)
        .rangeBetween(-week, 0)
      Tables(s, d, "events")
        .where(col("user_id") < 200L)
        .select(col("user_id"), tsUs.as("ts"),
          (sum(Exact.cents(col("value"))).over(w) / 100.0).as("week_value"))
    },

    // Anti join: customers with no order in the window — broadcast the
    // filtered orders keys if small, else shuffled hash anti join (no
    // NOT-IN subquery materialization).
    "q_anti_join" -> { (s, d) =>
      val ord = Tables(s, d, "orders")
        .where(col("o_orderdate") >= lit("2001-01-01"))
      Tables(s, d, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
    },

    // Semi join: suppliers with at least one late-shipped lineitem; the
    // probe side never duplicates (EXISTS semantics, one output per match).
    "q_semi_join" -> { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .where(col("l_shipdate") > lit("1998-09-02"))
      Tables(s, d, "supplier")
        .join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_nationkey"))
    },

    // Tumbling 1h windows over the event stream's batch view — the exact
    // plan Structured Streaming runs incrementally (see graft.streaming).
    // ts is nanos-since-epoch (long); window start = integer floor.
    "q_events_window" -> { (s, d) =>
      val hour = 3600L * 1000 * 1000 * 1000
      Tables(s, d, "events")
        .groupBy((col("ts") - (col("ts") % hour)).as("window_start_ns"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"),
             Exact.sumMoney(col("value")).as("sum_value"))
    },

    // Interval (range) join: events against overlapping campaign periods
    // via graft.ops.RangeJoin — bucketized equi-join + exact refine, never
    // a BroadcastNestedLoopJoin (PlanAuditSpec pins this). Periods are a
    // deterministic arithmetic fixture: 40 periods, 17h stride, 3-38h
    // length, overlapping by construction.
    "q_range_join" -> { (s, d) =>
      val hour = 3600L * 1000 * 1000 * 1000
      val t0 = 1704067200L * 1000000000L // 2024-01-01 00:00:00 UTC, ns
      val periods = s.range(0, 40).toDF("period_id")
        .withColumn("lo_ns", lit(t0) + col("period_id") * lit(17L * hour))
        .withColumn("hi_ns",
          col("lo_ns") + (lit(3L * hour) + (col("period_id") % 5) * lit(7L * hour)) - 1L)
      graft.ops.RangeJoin.intervalJoin(
          Tables(s, d, "events").select(col("ts"), col("value")), "ts",
          periods, "lo_ns", "hi_ns", bucket = 6L * hour)
        .groupBy(col("period_id"))
        .agg(count(lit(1)).as("n"),
             Exact.sumMoney(col("value")).as("sum_value"))
    },

    // Skew-salted fact⋈dim join (graft.ops.Layout.saltedJoin): lineitem
    // rows spread over 8 salt sub-keys, supplier replicated per salt — a
    // pathological hot supplier's rows land on 8 partitions instead of 1.
    // Result-identical to the plain join (the oracle IS the plain join);
    // LayoutSpec proves equality, this makes it driver-visible.
    "q_skew_join" -> { (s, d) =>
      graft.ops.Layout.saltedJoin(
          Tables(s, d, "lineitem")
            .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                    col("l_extendedprice"), col("l_discount")),
          Tables(s, d, "supplier")
            .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
          key = "l_suppkey",
          saltBy = col("l_orderkey") * lit(8L) + col("l_linenumber"),
          nSalts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
             (sum(revenueC4) / 1e4).as("revenue"))
    },

    // Fixed-width histogram: bucket = floor(price / width). One scan, one
    // map-side-combined shuffle keyed by bucket — the plan is identical to
    // any groupBy-count, so it scales like q1. Double division + floor are
    // IEEE-identical in both engines (no decimal round-trip needed).
    "q_histogram" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
             Exact.sumMoney(col("o_totalprice")).as("sum_price"))
    },

    // PIVOT: status columns per priority row. Explicit pivot values keep
    // the plan a single groupBy (no extra distinct-values job — at 100 TB
    // an implicit pivot would scan the fact once just to learn the
    // columns); count cells coalesce to 0 so both engines emit the same
    // value for empty cells.
    "q_pivot" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
    },

    // FULL OUTER join: segment customers vs recent-order counts — rows
    // survive from BOTH unmatched sides (the one join class a broadcast
    // can never implement; both sides shuffle on the key, which is the
    // correct — and only — distributed plan).
    "q_outer_join" -> { (s, d) =>
      val cust = Tables(s, d, "customer")
        .where(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      val ord = Tables(s, d, "orders")
        .where(col("o_orderdate") >= lit("2000-01-01"))
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders"))
      cust.join(ord, Seq("custkey"), "full_outer")
        .select(col("custkey"),
          col("c_mktsegment").isNotNull.as("in_segment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    },

    // Arg-extrema as an ASSOCIATIVE aggregate, not a per-group window
    // sort: max_by/min_by with a composite ordering struct runs partial
    // map-side and the shuffle carries ONE candidate per group-partition —
    // the row_number-window formulation sorts every group's rows on a
    // single reducer first. The ordering struct appends the (negated) key
    // so ties on price resolve to the smallest key deterministically:
    // bare max_by/min_by tie behavior is engine-undefined, and an oracle
    // can't hash-match "whichever row the scheduler saw last".
    "q_argmax" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_orderstatus").as("status"))
        .agg(
          max(col("o_totalprice")).as("max_price"),
          max_by(col("o_orderkey"),
            struct(col("o_totalprice"), -col("o_orderkey"))).as("argmax_key"),
          min(col("o_totalprice")).as("min_price"),
          min_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("argmin_key"))
    },

    // One-pass statistical moments, EXACT: corr/covar/stddev derive from
    // five power sums, and floating accumulation of those sums is
    // partition-order nondeterministic — so the sums run as exact scaled
    // longs (quantity/discount are ≤2dp: cents are integers, and products
    // of two cents values are exact scale-4 integers), and every derived
    // statistic is ONE fixed sequence of IEEE double ops over those exact
    // integers, textually identical to the oracle's formula — hence
    // bit-equal. Map-side partial agg, single shuffle, 3-group result.
    // Headroom: sxx grows as n·(100·qty)² ≈ 1.5e16 at 100× sf0.1 — the
    // long accumulator stays exact to 2^63 (~×600 more); built-in
    // corr/stddev_samp would be one pass too but carry running double
    // moments whose merge order varies run to run (StatsAggSpec pins the
    // exact path against them to 1e-9 relative).
    "q_stats_agg" -> { (s, d) =>
      val x = Exact.cents(col("l_quantity"))
      val y = Exact.cents(col("l_discount"))
      val sx = "CAST(sx AS DOUBLE)"; val sy = "CAST(sy AS DOUBLE)"
      val sxx = "CAST(sxx AS DOUBLE)"; val syy = "CAST(syy AS DOUBLE)"
      val sxy = "CAST(sxy AS DOUBLE)"
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(x).as("sx"), sum(y).as("sy"),
             sum(x * x).as("sxx"), sum(y * y).as("syy"),
             sum(x * y).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          expr(s"$sx / n / 100").as("avg_qty"),
          expr(s"sqrt(($sxx - $sx * $sx / n) / (n - 1)) / 100")
            .as("std_qty"),
          expr(s"($sxy - $sx * $sy / n) / (n - 1) / 10000").as("covar_qd"),
          expr(s"($sxy - $sx * $sy / n) / " +
               s"sqrt(($sxx - $sx * $sx / n) * ($syy - $sy * $sy / n))")
            .as("corr_qd"))
    },

    // Correlated NOT EXISTS through the SQL ENTRYPOINT: customers none of
    // whose orders exceed 50x their own account balance. The subquery
    // correlates on an equality (custkey) AND a cross-table inequality
    // (totalprice vs 50·acctbal) — Catalyst decorrelates it into a single
    // LEFT ANTI hash join carrying the inequality as the join condition
    // (one shuffle; a naive engine re-probes orders per customer row).
    // 50·acctbal is ONE IEEE multiply of identical operands in both
    // engines, so the inequality compares identical doubles. Complements q_anti_join
    // (API-level NOT IN shape, equality only).
    "q_exists_subquery" -> { (s, d) =>
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, d, "orders").createOrReplaceTempView(s"graft_ne_orders_$sfx")
      Tables(s, d, "customer").createOrReplaceTempView(s"graft_ne_cust_$sfx")
      s.sql(
        s"""SELECT c.c_custkey AS custkey, c.c_mktsegment AS mktsegment,
           |       c.c_acctbal AS acctbal
           |FROM graft_ne_cust_$sfx c
           |WHERE c.c_custkey < 500
           |  AND NOT EXISTS (
           |    SELECT 1 FROM graft_ne_orders_$sfx o
           |    WHERE o.o_custkey = c.c_custkey
           |      AND o.o_totalprice > 50 * c.c_acctbal)""".stripMargin)
    },

    // Correlated scalar subquery through the SQL ENTRYPOINT: orders beating
    // 1.5× their own customer's average. Catalyst decorrelates the
    // per-customer aggregate into a groupBy + equi-join on custkey (one
    // shuffle) — the same distributed plan the DataFrame API would
    // hand-write, proof that ad-hoc SQL against the engine doesn't fall
    // off the scale path (a naive engine re-runs the subquery per row).
    // Exact decimal avg on both sides so the 1.5× threshold compares
    // identical doubles (the ls_avg_range determinism rule).
    // LATERAL correlated subquery (r14 — the SQL-standard CROSS APPLY):
    // top-3 orders per customer via a per-row ORDER BY .. LIMIT
    // subquery. Catalyst DECORRELATES it (DomainJoin rewrite → join +
    // per-key rank), so the plan is one shuffle join + window, never a
    // per-row nested loop — exactly the top-n-per-group shape, spelled
    // the lateral way. Oracle is the same statement: DuckDB's lateral
    // semantics must agree row-for-row, including the deterministic
    // (price DESC, orderkey) cut.
    "q_lateral" -> { (s, d) =>
      val ov = "graft_lat_orders_" + d.replaceAll("[^A-Za-z0-9]", "_")
      val cv = "graft_lat_cust_" + d.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, d, "orders").createOrReplaceTempView(ov)
      Tables(s, d, "customer").createOrReplaceTempView(cv)
      s.sql(
        s"""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
           |FROM $cv c, LATERAL (
           |  SELECT o_orderkey, o_totalprice FROM $ov
           |  WHERE o_custkey = c.c_custkey AND o_totalprice > 250000.0
           |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
           |WHERE c.c_custkey % 3 = 0""".stripMargin)
    },

    "q_scalar_subquery" -> { (s, d) =>
      val view = "graft_orders_" + d.replaceAll("[^A-Za-z0-9]", "_")
      Tables(s, d, "orders").createOrReplaceTempView(view)
      s.sql(
        s"""SELECT o.o_custkey AS custkey, o.o_orderkey AS orderkey,
           |       o.o_totalprice AS totalprice
           |FROM $view o
           |WHERE o.o_custkey < 300
           |  AND o.o_totalprice > 1.5 * (
           |    SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
           |           / COUNT(*)
           |    FROM $view i WHERE i.o_custkey = o.o_custkey)""".stripMargin)
    },

    // Runtime bloom-filter join pruning, driver-visible: the selective dim
    // side (one month of orders) builds a bloom over its join keys at run
    // time and Catalyst injects `bloom_filter_might_contain` as a
    // scan-side filter on lineitem BEFORE its shuffle — at 100 TB the fact
    // side drops ~99% of its rows pre-exchange instead of shuffling
    // everything into the join (the runtime twin of static partition
    // pruning; PlanAuditSpec pins the injected filter). Conf-scoped clone
    // (the Tuning/StreamOps pattern): the injection thresholds assume
    // cluster-scale inputs (10 GB application-side scan default) and the
    // tiny test-SF dim would broadcast, so the clone zeroes the scan
    // threshold and disables auto-broadcast to pin the at-scale
    // SHUFFLE-join shape; the caller's session is untouched. The oracle is
    // the plain join — the bloom is pure pruning, false positives still
    // hit the exact join.
    "q_bloom_join" -> { (s0, d) =>
      // compose the two conf-scoped levers: size-aware shuffle width for
      // the fact side (Tuning — identity at test SF) + the bloom confs on
      // a clone of THAT session, so at 1000× the pruned fact still
      // shuffles at a spill-free width
      val s = bloomSession(
        graft.ops.Tuning.scaledSession(s0, d, Seq("lineitem", "orders")))
      val ord = Tables(s, d, "orders")
        .where(col("o_orderdate") >= lit("1997-03-01") &&
               col("o_orderdate") < lit("1997-04-01"))
      Tables(s, d, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
             Exact.sumMoney(col("l_extendedprice")).as("sum_price"))
    },

    // Exact distributed quantiles: element at rank ceil(q*n) per group,
    // deterministic tie-broken order — the same element the oracle picks,
    // so values hash-match (interpolating `percentile` definitions differ
    // between engines; picking a real element doesn't).
    //
    // Collapsed parallel-exact shape (the whole rank family's machinery,
    // factored as rankValues): equal prices collapse to (status, cents,
    // count) FIRST — a map-combined aggregate — so the range exchange and
    // windows move |distinct prices| rows, never the fact. This was the
    // last raw-row range sort in the family (r9 measured it ×6.5 at 100×
    // where the collapsed members sit at ×1.4-2.1; the same collapse took
    // q_mad from 92s to seconds at 1000×). Both quantiles are rank picks
    // off ONE collapsed cumulative table. The value at rank ceil(q·n) is
    // tiebreak-independent by construction (rank t falls inside one
    // value's run), so it is exactly the element the oracle's
    // row_number-over-(price, orderkey) picks; cents/100.0 re-lands on
    // the stored 2dp double bit-exactly (the sumMoney convention).
    // approx_percentile remains the constant-memory fallback when ±ε is
    // acceptable.
    "q_percentile" -> { (s, d) =>
      val o = Tables(s, d, "orders")
        .select(col("o_orderstatus"),
          Exact.cents(col("o_totalprice")).as("pc"))
      rankValues(o, "o_orderstatus", "pc", Seq(0.5, 0.95),
          s.conf.get("spark.sql.shuffle.partitions").toInt)
        .select(col("o_orderstatus"),
          (col("qval0") / 100.0).as("p50"),
          (col("qval1") / 100.0).as("p95"))
    },

    // KMV distinct-count sketch (functions/KMinValues): the k smallest
    // distinct md5 hashes of l_orderkey in ONE pass — a bounded ~2 KB
    // aggregation buffer, map-side partial, merge = bounded set union.
    // The declarative alternative (DISTINCT h ORDER BY h LIMIT k) pays a
    // full distinct shuffle of every hash — the thing a 100 TB count
    // exists to avoid; the sketch ships k longs per partition. The
    // estimate (k-1)·2^60/h_k is deterministic (exact order statistics +
    // one IEEE divide), so the DuckDB oracle — which takes the expensive
    // declarative path over the same hashes — agrees bit-for-bit; n_exact
    // is computed alongside to show the sketch lands within ~1/√k.
    "q_kmv_distinct" -> { (s, d) =>
      // native digest-prefix hash (functions/Md5HighBits ≡ the oracle's
      // hex-parse spelling) — at 1000× the hash IS the scan cost, and the
      // hex round-trip was measured ~40% of it
      val h = graft.functions.Md5HighBits.hash60(
        col("l_orderkey").cast("string"))
      Tables(s, d, "lineitem")
        .select(h.as("h"))
        .agg(
          graft.functions.KMinValues.kMinValues(col("h"), 256).as("kmv"),
          countDistinct(col("h")).as("n_exact"))
        .select(
          lit(256L).as("k"),
          // total over ANY cardinality (the cat_ndv/stream_ndv defense):
          // a sub-k sketch has no kth minimum — report its max, and let
          // the shared estimator return the exact count, so the query
          // never yields NULL on a low-cardinality column
          element_at(col("kmv"), least(size(col("kmv")), lit(256)))
            .as("kth_min"),
          graft.functions.KMinValues.ndvEstimate(col("kmv"), 256)
            .as("est_distinct"),
          col("n_exact"))
    },

    // Exact heavy hitters in two BOUNDED passes (functions/FrequentItems
    // — Misra–Gries candidates, then exact recount of ≤ k candidates):
    // the skewed item column (half the mass in 3 hot items, the rest
    // singletons) makes a plain GROUP BY shuffle ~n/2 distinct keys to
    // find 3 hot ones; the sketch pass is map-side with a ≤ 64-entry
    // buffer (k pairs per partition cross the wire), and the recount
    // scans once more with a 64-item IN filter pushed to parquet,
    // aggregating ≤ 64 groups. MG guarantees every item above n/64
    // survives the sketch (k=64 vs the n/16 report threshold = 4×
    // margin over the merge bound — FrequentItemsSpec pins the
    // guarantee under adversarial partitionings), and the exact second
    // pass makes the output deterministic — sketch counts never leave
    // the engine. The candidate collect is ≤ 64 strings: driver-small
    // by construction, the same bounded-side-input discipline as
    // pipe_tokenize's vocab.
    "q_heavy_hitters" -> { (s, d) =>
      def src = skewedItems(Tables(s, d, "orders"))
      val cand = src
        .agg(graft.functions.FrequentItems.freqItems(col("item"), 64)
          .as("cand"))
        .head().getSeq[String](0)
      exactRecount(src, cand)
    },

    // STREAMING heavy hitters (the sketch family's third streaming twin,
    // after stream_ndv and stream_quantile): the Misra–Gries aggregate
    // maintained incrementally over the orders file stream — streaming
    // state is ONE ≤64-entry buffer at ANY stream length (an exact
    // streaming GROUP BY would hold a row per distinct item: ~n/2 here),
    // merged across micro-batches in complete mode. The candidates then
    // exact-recount batch-side over the drained data (the q_heavy_hitters
    // second pass), so sketch counts never reach a result and the oracle
    // is the same exact rollup — the streaming half changes WHERE the
    // candidates come from, never what is reported.
    "stream_hh" -> { (s, d) =>
      val streamItems = skewedItems(
        graft.streaming.StreamOps.fileSource(s, d, "orders"))
      val drained = graft.streaming.StreamOps.drainComplete(s,
        streamItems.agg(graft.functions.FrequentItems
          .freqItems(col("item"), 64).as("cand")))
      val cand = drained.head().getSeq[String](0)
      exactRecount(skewedItems(Tables(s, d, "orders")), cand)
    },

    // Time-series GAP FILL (r9): the dashboard/feature-engineering
    // primitive every event store grows — a dense per-user daily grid
    // over the observed range, zero-filled counts plus a carried-forward
    // last-known daily sum. Shape: the day spine derives from a 1-ROW
    // global bounds aggregate broadcast onto the distinct-user set, so
    // the grid EXPANDS map-side (explode(sequence)) — no spine table is
    // ever shuffled; the only exchanges are the daily rollup (map-side
    // partial), the (user, day) left join (both sides keyed alike), and
    // the per-user fill window (bounded by the day range, never global).
    // Sums quantize to floor(value·10⁶) longs per row BEFORE summing —
    // associative, so the 32-partition Spark agg hash-matches DuckDB.
    // At 100 TB: days are bounded (time is physical), users shard; the
    // grid is |users|×|days| keyed rows of longs — no text, no arrays.
    "q_gap_fill" -> { (s, d) =>
      val day = 86400L * 1000 * 1000 * 1000 // ns
      val ev = Tables(s, d, "events")
        .select(col("user_id"), (col("ts") - col("ts") % day).as("day_ns"),
                col("value"))
      val daily = ev.groupBy(col("user_id"), col("day_ns"))
        .agg(count(lit(1)).as("n"),
             sum(floor(col("value") * 1e6).cast("long")).as("sum_q"))
      val bounds = daily.agg(min(col("day_ns")).as("lo"),
                             max(col("day_ns")).as("hi"))
      val grid = daily.select(col("user_id")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), lit(day))).as("day_ns"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day_ns"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day_ns"), "left")
        .select(col("user_id"), col("day_ns"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          last(col("sum_q"), ignoreNulls = true).over(w).as("filled_q"))
    },

    // Ordered FUNNEL analysis (r9): how far do users get through
    // view → click → purchase, each stage required to happen strictly
    // AFTER the previous one — the event-analytics staple. Each stage
    // is a keyed min-aggregate semi-joined to the previous stage's
    // per-user timestamp: three user-keyed shuffles (the same key every
    // time, so AQE co-partitions the chain), event rows carry only
    // (user_id, ts) past the type filter, and the stage outputs are one
    // row per qualifying user — at 100 TB the chain's working set is
    // |users|, never |events|. No window over the whole event stream,
    // no per-user event-list collection.
    "q_funnel" -> { (s, d) =>
      val ev = Tables(s, d, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.where(col("event_type") === "click")
        .join(s1, Seq("user_id")).where(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = ev.where(col("event_type") === "purchase")
        .join(s2, Seq("user_id")).where(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      s1.agg(count(lit(1)).as("n_users"))
        .select(lit(1L).as("stage"), col("n_users"))
        .unionByName(s2.agg(count(lit(1)).as("n_users"))
          .select(lit(2L).as("stage"), col("n_users")))
        .unionByName(s3.agg(count(lit(1)).as("n_users"))
          .select(lit(3L).as("stage"), col("n_users")))
    },

    // Streaming FUNNEL (r9): q_funnel's incremental twin — per-user
    // stage progression via flatMapGroupsWithState (streaming/Funnel):
    // state is three longs per user (the stage completion times), each
    // micro-batch folds its per-user slice in event-time order, and a
    // stage completion — final under the in-order batch contract — emits
    // once in append mode. The 3-row count rollup runs batch-side over
    // the drained hits (stream_quantile post-processing). Same output,
    // same oracle as q_funnel; q_funnel's three-join chain re-scans the
    // event table per stage, this maintains all stages in ONE pass.
    "stream_funnel" -> { (s, d) =>
      graft.streaming.Funnel.funnelCounts(s, d)
    },

    // Markov TRANSITIONS (r9): the per-user event-type transition
    // matrix — next-event prediction's sufficient statistic. One window
    // keyed by user (parallel across users; a user's event list is the
    // partition, never the stream), lead() pairs each event with its
    // successor under the TOTAL (ts, event_id) order, then a
    // map-combined |types²|-group count. Transition probabilities are
    // ONE IEEE division of two exact longs (n / row-total) — identical
    // doubles in both engines, no float accumulation anywhere.
    "q_markov" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val c = Tables(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type").as("src"))
        .withColumn("dst", lead(col("src"), 1).over(w))
        .where(col("dst").isNotNull)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      val tot = c.groupBy(col("src")).agg(sum(col("n")).as("tot"))
      c.join(tot, "src")
        .select(col("src"), col("dst"), col("n"),
          (col("n").cast("double") / col("tot").cast("double")).as("p"))
    },

    // Streaming MARKOV transitions (r9): q_markov's incremental twin —
    // per-user successor pairs via flatMapGroupsWithState (streaming/
    // Transitions): state is ONE event per user (the most recent), each
    // micro-batch folds its per-user slice in (ts, event_id) order, and
    // every consecutive pair emits once in append mode. Counts and
    // probabilities run batch-side over the drained edges — identical
    // post-processing, identical oracle to q_markov.
    "stream_markov" -> { (s, d) =>
      graft.streaming.Transitions.transitionCounts(s, d)
    },

    // Two-sample WELCH z-TEST (r9): the experimentation primitive — is
    // the mean event value of 'view' different from 'click'? Both
    // groups' moment sums come from ONE map-combined aggregate over the
    // type-filtered scan (pushed filter), the two 1-row branches
    // crossJoin broadcast, and the statistic is ONE fixed IEEE op
    // sequence over exact quantized sums (the q_stats_agg convention;
    // the 1e6 quanta cancel between numerator and denominator
    // algebraically, and both engines run the identical op order so
    // the doubles match bitwise). At 100 TB: one scan, \|2\| groups.
    "q_ttest" -> { (s, d) =>
      val vq = floor(col("value") * 1e6).cast("long")
      val st = Tables(s, d, "events")
        .where(col("event_type").isin("view", "click"))
        .select(col("event_type"), vq.as("vq"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("sv"),
             sum((col("vq") * col("vq")).cast("decimal(38,0)")).as("svv"))
      val a = st.where(col("event_type") === "view")
        .select(col("n").as("n1"), col("sv").as("sv1"), col("svv").as("svv1"))
      val b = st.where(col("event_type") === "click")
        .select(col("n").as("n2"), col("sv").as("sv2"), col("svv").as("svv2"))
      a.crossJoin(broadcast(b)).select(
        col("n1"), col("n2"),
        expr("CAST(sv1 AS DOUBLE) / n1 / 1000000.0").as("mean1"),
        expr("CAST(sv2 AS DOUBLE) / n2 / 1000000.0").as("mean2"),
        expr("(CAST(sv1 AS DOUBLE) / n1 - CAST(sv2 AS DOUBLE) / n2) / " +
          "sqrt((CAST(svv1 AS DOUBLE) - CAST(sv1 AS DOUBLE) * CAST(sv1 AS DOUBLE) / n1) / (n1 - 1) / n1 + " +
          "(CAST(svv2 AS DOUBLE) - CAST(sv2 AS DOUBLE) * CAST(sv2 AS DOUBLE) / n2) / (n2 - 1) / n2)")
          .as("z"))
    },

    // Streaming WELCH z-TEST (r9): q_ttest's incremental twin in the
    // stream_zscore shape — the two groups' moment sums (n, Σv, Σv²)
    // maintain as a 2-row streaming aggregation in complete mode (the
    // DECIMAL(38,0) square accumulator merges map-side per micro-batch;
    // the type filter prunes the stream before any state), then the
    // drained 2-row stats take the SAME fixed IEEE op sequence as
    // q_ttest — a standing experiment monitor pays only the changes.
    // Same oracle as q_ttest: the streamed sums are the batch sums.
    "stream_ttest" -> { (s, d) =>
      import graft.streaming.StreamOps
      val vq = floor(col("value") * 1e6).cast("long")
      val statsPlan = StreamOps.fileSource(s, d, "events")
        .where(col("event_type").isin("view", "click"))
        .select(col("event_type"), vq.as("vq"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("sv"),
             sum((col("vq") * col("vq")).cast("decimal(38,0)")).as("svv"))
      val st = StreamOps.drainComplete(s, statsPlan)
      val a = st.where(col("event_type") === "view")
        .select(col("n").as("n1"), col("sv").as("sv1"), col("svv").as("svv1"))
      val b = st.where(col("event_type") === "click")
        .select(col("n").as("n2"), col("sv").as("sv2"), col("svv").as("svv2"))
      a.crossJoin(broadcast(b)).select(
        col("n1"), col("n2"),
        expr("CAST(sv1 AS DOUBLE) / n1 / 1000000.0").as("mean1"),
        expr("CAST(sv2 AS DOUBLE) / n2 / 1000000.0").as("mean2"),
        expr("(CAST(sv1 AS DOUBLE) / n1 - CAST(sv2 AS DOUBLE) / n2) / " +
          "sqrt((CAST(svv1 AS DOUBLE) - CAST(sv1 AS DOUBLE) * CAST(sv1 AS DOUBLE) / n1) / (n1 - 1) / n1 + " +
          "(CAST(svv2 AS DOUBLE) - CAST(sv2 AS DOUBLE) * CAST(sv2 AS DOUBLE) / n2) / (n2 - 1) / n2)")
          .as("z"))
    },

    // Per-group SIMPLE OLS (r9): extendedprice regressed on quantity per
    // returnflag — slope / intercept / R² from the q_stats_agg moment-sum
    // recipe (ONE map-side combined scan into |groups| rows of exact
    // sums; the quantity·price and price² per-row products overflow a
    // long at 100 TB row counts, so those two accumulate as
    // DECIMAL(38,0), the q_zscore convention). slope computes once per
    // group and intercept REFERENCES it (both engines reuse the alias —
    // one shared IEEE value, no textual duplication drift). At 100 TB:
    // one scan, zero joins, |groups| output rows.
    "q_linreg" -> { (s, d) =>
      val x = Exact.cents(col("l_quantity"))
      val y = Exact.cents(col("l_extendedprice"))
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(x).as("sx"), sum(y).as("sy"),
             sum((x * x).cast("decimal(38,0)")).as("sxx"),
             sum((y * y).cast("decimal(38,0)")).as("syy"),
             sum((x * y).cast("decimal(38,0)")).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          expr("(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / " +
               "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)")
            .as("slope"),
          col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"))
        .select(col("l_returnflag"), col("n"), col("slope"),
          expr("(CAST(sy AS DOUBLE) / n - slope * (CAST(sx AS DOUBLE) / n)) / 100.0")
            .as("intercept"),
          expr("((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) * " +
               " (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)) / " +
               "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) * " +
               " (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n))")
            .as("r2"))
    },

    // CHI-SQUARED independence cells (r9): is order status independent of
    // priority? ONE scan map-combines into the |status|×|priority| cell
    // table; row totals, column totals and N are RE-AGGREGATIONS of the
    // tiny cell table (the fact is scanned exactly once), broadcast back
    // onto the cells. Expected counts and per-cell contributions are one
    // fixed IEEE sequence over exact longs; `expected` computes once and
    // `contrib` references the alias (shared value in both engines). The
    // per-cell rows ARE the result — a grand total would sum doubles in
    // engine-dependent order; the caller folds the ≤|cells| rows any way
    // it likes. At 100 TB: one scan, |cells| rows after it.
    "q_chi2" -> { (s, d) =>
      val cells = Tables(s, d, "orders")
        .groupBy(col("o_orderstatus").as("status"),
                 col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("obs"))
      val rt = cells.groupBy(col("status")).agg(sum(col("obs")).as("rt"))
      val ct = cells.groupBy(col("prio")).agg(sum(col("obs")).as("ct"))
      val tot = cells.agg(sum(col("obs")).as("total"))
      cells.join(broadcast(rt), "status").join(broadcast(ct), "prio")
        .crossJoin(broadcast(tot))
        .select(col("status"), col("prio"), col("obs"),
          expr("CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / total")
            .as("expected"))
        .select(col("status"), col("prio"), col("obs"), col("expected"),
          expr("(obs - expected) * (obs - expected) / expected")
            .as("contrib"))
    },

    // TRIANGLE COUNTING (r9; r15 rewrite): the co-purchase graph's
    // clustering — nodes = parts, edges = part pairs sharing an order.
    // Degree-oriented FORWARD algorithm: orient every edge toward the
    // higher (degree, id) endpoint (out-degrees O(√m)-bounded), build
    // each source's out-neighbor list, and count per oriented edge
    // u→v the overlap |N⁺(u) ∩ N⁺(v)| — each triangle counted exactly
    // once, at its lowest-(deg,id) corner, same integer as before.
    // WHY not the r9 wedge-enumeration join (measure-first, guide §1 +
    // §2.3): at sf0.1 the graph is dense (20k nodes, 1.2M edges) and
    // enumerating wedges materialized 41M (b, c) rows through the
    // closing join's exchange to keep only 1.9M closures — measured
    // 13.2s vs 4.0s for the intersect form (back-to-back same-JVM A/B;
    // bloom-prefiltering the wedges measured 15.0s and a broadcast
    // close 7.1s — the win is NOT the join strategy, it is never
    // materializing wedges as rows). The set intersection does the same
    // Σ od(u)+od(v) element work CPU-side, but the only exchanges are
    // |E|-row key shuffles (adjacency build + two slim joins) — the
    // shape that survives 100 TB, where the wedge set is quadratically
    // larger than the edge set. Wedge totals Σ d(d−1)/2 are exact
    // longs; transitivity is one IEEE divide. The oracle counts the
    // same triangles declaratively (lo<hi three-way join — same
    // integer, different plan).
    "q_triangles" -> { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      // the pair self-join feeds three consumers (deg, ed, edges) —
      // measured r12: ReusedExchange already dedupes the repeated
      // subtrees (PlanAuditSpec pins it), and an explicit localCheckpoint
      // of |E| benched SLOWER (5.8s vs 5.5s at sf0.1: the block-store
      // materialization costs more than the reuse it would save), so the
      // declarative shape stays
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("lo"), col("b.l_partkey").as("hi"))
        .distinct()
      val deg = e.select(col("lo").as("v"))
        .unionAll(e.select(col("hi").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      // orient: src = the (deg, id)-smaller endpoint
      val ed = e
        .join(deg.select(col("v").as("lo"), col("deg").as("dlo")), "lo")
        .join(deg.select(col("v").as("hi"), col("deg").as("dhi")), "hi")
      val loFirst = col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi"))
      val ori = ed.select(
        when(loFirst, col("lo")).otherwise(col("hi")).as("src"),
        when(loFirst, col("hi")).otherwise(col("lo")).as("dst"))
      // out-adjacency per source (O(√m)-bounded arrays); list order is
      // irrelevant — only the intersection SIZE is consumed
      val adj = ori.groupBy(col("src"))
        .agg(collect_list(col("dst")).as("nbrs"))
      // per oriented edge u→v: triangles closed over it = |N⁺(u) ∩ N⁺(v)|
      // (a v with no out-neighbors contributes 0 — the inner join
      // dropping it is the same sum). Keyed joins, never a broadcast of
      // the adjacency: |V|·√m payload outgrows any broadcast at scale.
      val tri = ori
        .join(adj.select(col("src").as("_u"), col("nbrs").as("_un")),
          col("src") === col("_u"))
        .join(adj.select(col("src").as("_v"), col("nbrs").as("_vn")),
          col("dst") === col("_v"))
        .select(size(array_intersect(col("_un"), col("_vn")))
          .cast("bigint").as("t"))
        // coalesce: an edgeless graph sums to NULL where the old count
        // was 0 — keep the exact 0
        .agg(coalesce(sum(col("t")), lit(0L)).as("n_tri"))
      // Σ d(d−1) stays an exact long; the halving is an integer DIV
      // (d(d−1) is even) — never a double division on the path
      val nodes = deg.agg(count(lit(1)).as("n_nodes"),
        sum(col("deg") * (col("deg") - 1)).as("w2"))
      val edges = e.agg(count(lit(1)).as("n_edges"))
      nodes.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
        .select(col("n_nodes"), col("n_edges"),
          expr("w2 DIV 2").as("n_wedges"), col("n_tri"),
          expr("CAST(3 * n_tri AS DOUBLE) / CAST(w2 DIV 2 AS DOUBLE)")
            .as("transitivity"))
    },

    // AUTOCORRELATION (r9): lag-1..7 Pearson ACF of the daily event-count
    // series — the seasonality probe before any forecasting. ONE fact
    // scan map-combines into the |days|-row daily series; the 7 lagged
    // pairings come from a 7-way map-side explode of that TINY table
    // joined back to itself on day index (a key join of |days| rows —
    // never a global-order window, whose single partition is the
    // classic time-series trap); per-lag moment sums are exact longs
    // (DECIMAL(38,0) products — day counts square past long headroom at
    // 100 TB) and each r_k is ONE fixed IEEE sequence. At 100 TB: one
    // fact scan, then arithmetic on thousands of rows.
    "q_acf" -> { (s, d) =>
      val day = 86400L * 1000 * 1000 * 1000
      val daily = Tables(s, d, "events")
        .groupBy(expr(s"ts div $day").as("idx"))
        .agg(count(lit(1)).as("cnt"))
      val probe = daily.select(col("idx"), col("cnt").as("x"),
          explode(array((1 to 7).map(lit(_)): _*)).as("k"))
        .select((col("idx") + col("k")).as("yidx"), col("k"), col("x"))
      probe.join(daily.select(col("idx").as("yidx"), col("cnt").as("y")),
          "yidx")
        .groupBy(col("k"))
        .agg(count(lit(1)).as("m"),
             sum(col("x")).as("sx"), sum(col("y")).as("sy"),
             sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
             sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
             sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
        .select(col("k").cast("long").as("lag"), col("m"),
          expr("(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / m) / " +
               "sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / m) * " +
               "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / m))")
            .as("acf"))
    },

    // MEDIAN ABSOLUTE DEVIATION (r9): the robust twin of q_zscore — a
    // long-tailed metric swamps mean/std, while median ± MAD ignores any
    // minority of outliers entirely. TWO passes of the q_percentile
    // distributed-rank machinery (factored as rankValue, which collapses
    // equal values to counts FIRST — range partitions + local running
    // counts + broadcast offsets move |distinct values| rows, never the
    // fact; no single reducer per group): median of the micro-quantized
    // value, then median of |v − med| with the |groups|-row median table
    // broadcast back between passes. Ranks pick EXACT integers — the
    // rank-t value is tiebreak-independent by construction — so both
    // engines agree to the bit; the /1e6 re-scale is the only IEEE op.
    "q_mad" -> { (s, d) =>
      val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
      val ev = Tables(s, d, "events")
        .select(col("event_type"),
          floor(col("value") * 1e6).cast("long").as("vq"))
      val med = rankValue(ev, "event_type", "vq", 0.5, nPart)
        .withColumnRenamed("qval", "med_q")
      val dev = ev.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("vq") - col("med_q")).as("dq"))
      val mad = rankValue(dev, "event_type", "dq", 0.5, nPart)
        .withColumnRenamed("qval", "mad_q")
      med.join(broadcast(mad), "event_type")
        .select(col("event_type"),
          expr("CAST(med_q AS DOUBLE) / 1000000.0").as("median"),
          expr("CAST(mad_q AS DOUBLE) / 1000000.0").as("mad"))
    },

    // SIMPSON DIVERSITY (r9): per-user behavioral diversity 1 − Σpᵢ² over
    // event types — the entropy-class statistic that stays inside the
    // exact-arithmetic convention (Shannon's ln() is not bitwise-portable
    // across libms; Gini–Simpson ranks the same way through pure
    // divisions). Two-level map-combined aggregation: (user, type) counts
    // → per-user (n, Σc²) with DECIMAL(38,0) squares; top-20 most diverse
    // under the TOTAL (simpson desc, user asc) order via
    // TakeOrderedAndProject — per-partition heaps, never a global sort.
    "q_diversity" -> { (s, d) =>
      Tables(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_types"),
             sum((col("c") * col("c")).cast("decimal(38,0)")).as("ss"))
        .select(col("user_id"), col("n"), col("n_types"),
          expr("1.0 - CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))")
            .as("simpson"))
        .orderBy(col("simpson").desc, col("user_id").asc)
        .limit(20)
    },

    // BFS HOP DISTANCES (r9, ops/Graph.bfs): reachability rings around
    // the min-id supplier in the symmetrized supplier↔customer trade
    // graph (the q_pagerank edge set) — "how far does influence spread
    // in k hops". The seed stays a DATAFRAME (min over the edge table —
    // never a collect); per round one equi-join of the file-backed edge
    // table against the frontier + an anti join against the |reached|
    // visited state (localCheckpoint'd, predecessors freed — the
    // Components idiom). The oracle walks the same graph with a
    // recursive CTE — frontier semantics in declarative form.
    "q_bfs" -> { (s, d) =>
      // the STANDING bucketed edge table (r11): the symmetrized trade
      // graph is derived and bucketed-by-src ONCE per corpus and probed
      // by every traversal — the per-run ~|E| scratch materialization
      // (1.17B edges at 1000×) and the per-hop Exchange+Sort of |E|
      // both amortize away (Graph.standingEdges)
      val e = tradeEdges(s, d)
      val seed = e.agg(min(col("src")).as("node"))
      graft.ops.Graph.bfsOn(e, seed, 3)
        .groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
    },

    // HYPERLOGLOG distinct estimate (r9): the register-based NDV sketch
    // next to the KMV family — 1024 registers of max leading-zero rank
    // over the 60-bit md5 prefix, fully DECLARATIVE and fully ORACLED:
    // registers are exact integers (bucket = top 10 bits, rho from the
    // bit length of the 50-bit remainder — string length of the binary
    // form, no log2), and the harmonic estimate folds 2^-M terms in
    // BUCKET ORDER via an ordered-list fold, so the IEEE sum is
    // engine-identical (2^-M values are exact doubles — 1/(1<<M), no
    // pow()). Raw estimate only (the small-range correction needs
    // ln(), the banned transcendental) — v_empty is emitted so a caller
    // can see when that regime applies; n_exact alongside for honesty.
    // One map-combined pass; state is 1024 registers at any scale.
    "q_hll" -> { (s, d) =>
      val h = graft.functions.Md5HighBits.hash60(
        col("l_orderkey").cast("string"))
      val regs = Tables(s, d, "lineitem")
        .select(h.as("h"))
        .select(expr("shiftright(h, 50)").as("bucket"),
                expr("h & 1125899906842623").as("w"))
        .select(col("bucket"),
          when(col("w") === 0, lit(51))
            .otherwise(lit(51) - length(bin(col("w")))).as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("mreg"))
      val exact = Tables(s, d, "lineitem")
        .agg(countDistinct(h).as("n_exact"))
      regs
        .agg(sort_array(collect_list(struct(col("bucket"), col("mreg"))))
          .as("rs"))
        .select(size(col("rs")).cast("long").as("occ"),
          expr("aggregate(rs, CAST(0.0 AS DOUBLE), (acc, x) -> " +
               "acc + 1.0 / CAST(shiftleft(CAST(1 AS BIGINT), x.mreg) AS DOUBLE))")
            .as("z_occ"))
        .crossJoin(broadcast(exact))
        // α·m² computed in SCALA doubles: a bare `0.7213` inside expr()
        // parses as DECIMAL in Spark SQL but DOUBLE in DuckDB — the
        // decimal-evaluated constant subtree drifted the estimate at
        // 1e-10 (caught by the gate); Scala's left-to-right IEEE ops
        // are exactly DuckDB's constant fold
        .select(lit(1024L).as("m"), (lit(1024L) - col("occ")).as("v_empty"),
          (lit(0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0) /
            (col("z_occ") + expr("CAST(1024 - occ AS DOUBLE)")))
            .as("estimate"),
          col("n_exact"))
    },

    // HERFINDAHL–HIRSCHMAN INDEX (r9): revenue concentration per nation
    // — "is this market a monopoly" as one number. FULLY exact without
    // any ordered fold: HHI = Σsᵢ²/S² where sᵢ = each supplier's exact
    // cents — Σsᵢ² accumulates as DECIMAL(38,0) map-side (associative,
    // order-free), and the single division of two exact quantities is
    // the only IEEE op. Two aggregations (supplier totals → nation
    // moments) + one broadcast dim join; |nations| rows out.
    "q_herfindahl" -> { (s, d) =>
      val sup = Tables(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(Exact.cents(col("l_extendedprice"))).as("c"))
      val nat = Tables(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      sup.join(broadcast(nat), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
             sum(col("c")).as("sc"),
             sum(col("c").cast("decimal(38,0)") * col("c")).as("scc"))
        .select(col("nationkey"), col("n_suppliers"),
          expr("CAST(scc AS DOUBLE) / " +
               "(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))").as("hhi"))
    },

    // PARETO SHARE (r9): what fraction of revenue do the top-decile
    // customers hold — the 80/20 dashboard number. The p90 cut comes
    // from ONE deterministic rankValue pass over per-customer exact
    // revenue (collapsed values + withBucket); the share is a
    // conditional sum against the broadcast 1-row cut — exact cents
    // end to end, one IEEE division. Decile membership is by VALUE
    // (ties at the cut all count — deterministic in both engines).
    "q_pareto_share" -> { (s, d) =>
      val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
      val cust = Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(Exact.cents(col("o_totalprice"))).as("rev"))
        .withColumn("g", lit(1))
      val cut = rankValue(cust, "g", "rev", 0.9, nPart)
        .withColumnRenamed("qval", "p90")
      cust.join(broadcast(cut), "g")
        .agg(count(lit(1)).as("n_cust"),
             sum(when(col("rev") >= col("p90"), 1L).otherwise(0L))
               .as("n_top"),
             sum(col("rev")).as("total"),
             sum(when(col("rev") >= col("p90"), col("rev")).otherwise(0L))
               .as("top_rev"))
        .select(col("n_cust"), col("n_top"),
          expr("CAST(top_rev AS DOUBLE) / CAST(total AS DOUBLE)")
            .as("top_share"))
    },

    // KOLMOGOROV–SMIRNOV two-sample test (r9): the distribution-drift
    // detector — max |CDF₁ − CDF₂| between the view and click value
    // distributions (the statistic behind "did the data shift" checks
    // on ML features). The collapse machinery with TWO counters: equal
    // values collapse to (v, c₁, c₂) map-side, range partition in value
    // order, per-partition running sums of BOTH counters + broadcast
    // prefix offsets (partition totals read off the running sums'
    // maxima); D evaluates per distinct value from exact integer
    // cumulative counts (two IEEE divisions + abs), and the argmax is
    // TakeOrderedAndProject under the total (d desc, v asc) order.
    "q_ks" -> { (s, d) =>
      twoSampleCum(s, d)
        .select(col("vq"), col("n1"), col("n2"),
          expr("abs(CAST(a1 AS DOUBLE) / n1 - " +
               "CAST(a2 AS DOUBLE) / n2)").as("ks_d"))
        .orderBy(col("ks_d").desc, col("vq").asc).limit(1)
        .select(expr("CAST(vq AS DOUBLE) / 1000000.0").as("at_value"),
          col("ks_d"), col("n1"), col("n2"))
    },

    // MANN–WHITNEY U (r9): the rank-sum test — "does one group's value
    // distribution stochastically dominate the other's" without any
    // normality assumption (the nonparametric sibling of q_ttest). From
    // the SAME collapsed two-counter cumulatives as q_ks: with ties
    // collapsed, 2·U₁ = Σ_v c₁(v)·(2·cum₂(<v) + c₂(v)) is an EXACT
    // integer (DECIMAL(38,0) accumulator — per-value products pass long
    // headroom at 100 TB), and the normal-approximation z is one fixed
    // IEEE sequence over (2U, n₁, n₂). The tie-corrected variance is
    // deliberately omitted (documented): the untied form is the
    // portable one, and 2U itself is exact either way.
    "q_mwu" -> { (s, d) =>
      twoSampleCum(s, d)
        .select(col("n1"), col("n2"),
          (col("c1").cast("decimal(38,0)") *
            (lit(2) * (col("a2") - col("c2")) + col("c2"))).as("t"))
        .groupBy(col("n1"), col("n2"))
        .agg(sum(col("t")).as("u2"))
        .select(col("n1"), col("n2"),
          expr("CAST(u2 AS DOUBLE) / 2.0").as("u1"),
          expr("(CAST(u2 AS DOUBLE) / 2.0 - " +
               "CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) / " +
               "sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * " +
               "(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0) / 12.0)")
            .as("z"))
    },

    // CRAMÉR'S V (r9): q_chi2 completed into the [0,1] association
    // strength — the chi² total folds the per-cell contributions in
    // (status, prio) ORDER (an ordered-list fold over ≤|cells| doubles,
    // the q_hll idiom — a bare SUM of doubles would be
    // partition-order-dependent and could never oracle), and
    // V = sqrt(chi²/(n·min(r−1, c−1))) is one fixed IEEE sequence.
    // Same one-scan cell table as q_chi2; everything after is
    // arithmetic on ≤|cells| rows.
    "q_cramer" -> { (s, d) =>
      val cells = Tables(s, d, "orders")
        .groupBy(col("o_orderstatus").as("status"),
                 col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("obs"))
      val rt = cells.groupBy(col("status")).agg(sum(col("obs")).as("rt"))
      val ct = cells.groupBy(col("prio")).agg(sum(col("obs")).as("ct"))
      val tot = cells.agg(sum(col("obs")).as("total"))
      cells.join(broadcast(rt), "status").join(broadcast(ct), "prio")
        .crossJoin(broadcast(tot))
        .select(col("status"), col("prio"), col("obs"),
          expr("CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / total")
            .as("expected"))
        .select(col("status"), col("prio"), col("obs"),
          expr("(obs - expected) * (obs - expected) / expected")
            .as("contrib"))
        .agg(countDistinct(col("status")).as("r"),
             countDistinct(col("prio")).as("c"),
             sum(col("obs")).as("n"),
             sort_array(collect_list(
               struct(col("status"), col("prio"), col("contrib"))))
               .as("cs"))
        .select(col("r"), col("c"), col("n"),
          expr("aggregate(cs, CAST(0.0 AS DOUBLE), " +
               "(acc, x) -> acc + x.contrib)").as("chi2"))
        .select(col("r"), col("c"), col("n"), col("chi2"),
          expr("sqrt(chi2 / (CAST(n AS DOUBLE) * " +
               "CAST(least(r - 1, c - 1) AS DOUBLE)))").as("cramer_v"))
    },

    // STREAMING CHI-SQUARED cells (r9): q_chi2's incremental twin — the
    // |status×priority| contingency cells maintain as a streaming
    // aggregation (state = |cells| rows at any stream length, merged
    // map-side per micro-batch), then the drained tiny table takes
    // q_chi2's marginal/expected/contribution arithmetic batch-side.
    // A standing independence monitor pays only the changes; same
    // oracle as the batch form.
    "stream_chi2" -> { (s, d) =>
      import graft.streaming.StreamOps
      val cellsPlan = StreamOps.fileSource(s, d, "orders")
        .groupBy(col("o_orderstatus").as("status"),
                 col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("obs"))
      val cells = StreamOps.drainComplete(s, cellsPlan)
      val rt = cells.groupBy(col("status")).agg(sum(col("obs")).as("rt"))
      val ct = cells.groupBy(col("prio")).agg(sum(col("obs")).as("ct"))
      val tot = cells.agg(sum(col("obs")).as("total"))
      cells.join(broadcast(rt), "status").join(broadcast(ct), "prio")
        .crossJoin(broadcast(tot))
        .select(col("status"), col("prio"), col("obs"),
          expr("CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / total")
            .as("expected"))
        .select(col("status"), col("prio"), col("obs"), col("expected"),
          expr("(obs - expected) * (obs - expected) / expected")
            .as("contrib"))
    },

    // STREAMING HYPERLOGLOG (r9): the register sketch maintained
    // incrementally — bucket-max registers are an associative streaming
    // aggregation (state is ≤1024 rows at ANY stream length, merged
    // map-side per micro-batch; the register-NDV twin of stream_ndv's
    // KMV), with q_hll's bucket-ordered fold + estimate batch-side over
    // the drained registers. Distinct customers over the orders stream;
    // every addition in the fold is exact (register spread < 52 bits),
    // so the streamed estimate oracles bit-for-bit.
    "stream_hll" -> { (s, d) =>
      import graft.streaming.StreamOps
      val h = graft.functions.Md5HighBits.hash60(
        col("o_custkey").cast("string"))
      val regsPlan = StreamOps.fileSource(s, d, "orders")
        .select(h.as("h"))
        .select(expr("shiftright(h, 50)").as("bucket"),
                expr("h & 1125899906842623").as("w"))
        .select(col("bucket"),
          when(col("w") === 0, lit(51))
            .otherwise(lit(51) - length(bin(col("w")))).as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("mreg"))
      val exact = Tables(s, d, "orders")
        .agg(countDistinct(graft.functions.Md5HighBits.hash60(
          col("o_custkey").cast("string"))).as("n_exact"))
      StreamOps.drainComplete(s, regsPlan)
        .agg(sort_array(collect_list(struct(col("bucket"), col("mreg"))))
          .as("rs"))
        .select(size(col("rs")).cast("long").as("occ"),
          expr("aggregate(rs, CAST(0.0 AS DOUBLE), (acc, x) -> " +
               "acc + 1.0 / CAST(shiftleft(CAST(1 AS BIGINT), x.mreg) AS DOUBLE))")
            .as("z_occ"))
        .crossJoin(broadcast(exact))
        .select(lit(1024L).as("m"), (lit(1024L) - col("occ")).as("v_empty"),
          (lit(0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0) /
            (col("z_occ") + expr("CAST(1024 - occ AS DOUBLE)")))
            .as("estimate"),
          col("n_exact"))
    },

    // HISTOGRAM QUANTILES (r9): p50/p95/p99 per group as [lo, hi)
    // BRACKETS off a fixed-bin histogram — the cheap-at-scale
    // alternative to q_percentile's exact ranks: ONE map-combined
    // aggregate (|groups × occupied buckets| rows out, the fact never
    // range-sorted), every window below runs over that tiny table, and
    // the one-bucket-width error bound is explicit in the output
    // (stream_quantile is this operator's streaming twin — same
    // deterministic integer histogram, so both oracle exactly).
    "q_quantile_hist" -> { (s, d) =>
      val width = 25.0
      val h = Tables(s, d, "events")
        .groupBy(col("event_type"),
          floor(col("value") / width).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val cum = h
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("event_type")).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n",
          sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
      Seq(0.5, 0.95, 0.99).map { q =>
        cum.where(col("cum") >= ceil(lit(q) * col("n")))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("bucket"))))
          .where(col("rk") === 1)
          .select(col("event_type"), lit(q).as("q"),
            (col("bucket") * width).as("est_lo"),
            ((col("bucket") + 1) * width).as("est_hi"), col("n"))
      }.reduce(_ unionByName _)
    },

    // DIFFERENCE-IN-DIFFERENCES (r9): the quasi-experiment estimator —
    // did the treated group's metric move MORE than the control's
    // across the cutover? Four (group × period) cells of exact
    // micro-quantized (n, Σv) from ONE map-combined scan (the period
    // boundary is a fixed literal day — 2024-01-16 = epoch-day 19738),
    // conditional aggregation so no second scan; the estimate is one
    // fixed IEEE sequence over the four exact cells. 1 output row.
    "q_did" -> { (s, d) =>
      val day = 86400L * 1000 * 1000 * 1000
      Tables(s, d, "events")
        .where(col("event_type").isin("view", "click"))
        .select(col("event_type").as("g"),
          (expr(s"ts div $day") >= 19738L).as("post"),
          floor(col("value") * 1e6).cast("long").as("vq"))
        .agg(
          sum(when(col("g") === "click" && !col("post"), col("vq"))).as("s_t0"),
          count(when(col("g") === "click" && !col("post"), lit(1))).as("n_t0"),
          sum(when(col("g") === "click" && col("post"), col("vq"))).as("s_t1"),
          count(when(col("g") === "click" && col("post"), lit(1))).as("n_t1"),
          sum(when(col("g") === "view" && !col("post"), col("vq"))).as("s_c0"),
          count(when(col("g") === "view" && !col("post"), lit(1))).as("n_c0"),
          sum(when(col("g") === "view" && col("post"), col("vq"))).as("s_c1"),
          count(when(col("g") === "view" && col("post"), lit(1))).as("n_c1"))
        .select(col("n_t0"), col("n_t1"), col("n_c0"), col("n_c1"),
          expr("(CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0) / 1000000.0")
            .as("delta_treat"),
          expr("(CAST(s_c1 AS DOUBLE) / n_c1 - CAST(s_c0 AS DOUBLE) / n_c0) / 1000000.0")
            .as("delta_ctrl"),
          expr("((CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0) - " +
               " (CAST(s_c1 AS DOUBLE) / n_c1 - CAST(s_c0 AS DOUBLE) / n_c0)) / 1000000.0")
            .as("did"))
    },

    // WINSORIZED MEAN (r9): the robust mean — per-type values clamped
    // to the exact [p05, p95] before averaging, so a handful of extreme
    // rows can't move the metric. The p05/p95 cuts come from TWO
    // rankValue passes (the collapsed machinery — |distinct values|
    // rows through the exchange, the fact only map-aggregates), the
    // two |groups|-row cut tables broadcast back, clamping is map-only
    // integer min/max, and both means are one IEEE sequence over exact
    // sums. Raw mean alongside shows what the tails were doing.
    "q_winsorize" -> { (s, d) =>
      val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
      val ev = Tables(s, d, "events")
        .select(col("event_type"),
          floor(col("value") * 1e6).cast("long").as("vq"))
      val lo = rankValue(ev, "event_type", "vq", 0.05, nPart)
        .withColumnRenamed("qval", "p05")
      val hi = rankValue(ev, "event_type", "vq", 0.95, nPart)
        .withColumnRenamed("qval", "p95")
      ev.join(broadcast(lo), "event_type").join(broadcast(hi), "event_type")
        .select(col("event_type"), col("vq"),
          greatest(col("p05"), least(col("vq"), col("p95"))).as("wq"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("sv"),
             sum(col("wq")).as("sw"))
        .select(col("event_type"), col("n"),
          expr("CAST(sv AS DOUBLE) / n / 1000000.0").as("mean_raw"),
          expr("CAST(sw AS DOUBLE) / n / 1000000.0").as("mean_winsor"))
    },

    // FORECAST BACKTEST (r9): seasonal-naive — predict each day's
    // per-type total with the value 7 days earlier, score MAE/MAPE over
    // every day with both sides present. The eval harness behind any
    // real forecasting deploy: before shipping a model, beat this
    // baseline. ONE fact scan into the |types×days| totals; the lag
    // pairing is a key self-join of that tiny table; absolute errors
    // are exact micro-longs and the two scores are IEEE divisions of
    // exact sums. At 100 TB: one scan, arithmetic after it.
    "q_backtest" -> { (s, d) =>
      val day = 86400L * 1000 * 1000 * 1000
      val daily = Tables(s, d, "events")
        .groupBy(col("event_type"), expr(s"ts div $day").as("idx"))
        .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      val fc = daily.select(col("event_type"),
        (col("idx") + 7).as("idx"), col("x").as("pred"))
      daily.join(fc, Seq("event_type", "idx"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
             sum(abs(col("x") - col("pred"))).as("sae"),
             sum(abs(col("x"))).as("sax"))
        .select(col("event_type"), col("n_days"),
          expr("CAST(sae AS DOUBLE) / n_days / 1000000.0").as("mae"),
          expr("CAST(sae AS DOUBLE) / CAST(sax AS DOUBLE)").as("wape"))
    },

    // 2-D SKYLINE / Pareto frontier (r9): parts where no other part is
    // both cheaper-or-equal AND larger-or-equal (strict somewhere) — the
    // multi-objective shortlist. The naive form is an all-pairs NOT
    // EXISTS (the oracle's declarative shape — O(n²), fine single-node);
    // distributed it is ONE range partition in (price asc, size desc)
    // order over the DISTINCT (price, size) pairs + a per-partition
    // running max + the broadcast prefix-max of partition maxima (the
    // q_percentile offset machinery generalized from counts to MAX):
    // a pair is on the frontier iff its size exceeds every strict
    // predecessor's — one pass, no self-join, no single reducer. Exact
    // cents make the order engine-identical.
    "q_skyline" -> { (s, d) =>
      val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
      val pairs = Tables(s, d, "part")
        .select(Exact.cents(col("p_retailprice")).as("pc"),
                col("p_size").cast("long").as("sz"))
        .groupBy(col("pc"), col("sz")).agg(count(lit(1)).as("n_parts"))
      // bucket on the PRIMARY order key only (price) — equal prices
      // share a bucket, so the within-bucket (pc asc, sz desc) window
      // composes with the cross-bucket prefix over pid
      val parts = withBucket(pairs, "pc", nPart)
      val wLocal = Window.partitionBy(col("pid"))
        .orderBy(col("pc").asc, col("sz").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      // hist hangs off `local` (not `parts`): its subtree then shares the
      // window's Exchange via ReusedExchange — one scan, one shuffle
      // (building it off `parts` re-evaluates the whole input; the
      // q_gini 2×-evaluation lesson)
      val local = parts.withColumn("lmax", max(col("sz")).over(wLocal))
      val hist = local.groupBy(col("pid")).agg(max(col("sz")).as("pmax"))
      val wOff = Window.orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = hist
        .withColumn("off", max(col("pmax")).over(wOff))
        .select(col("pid").as("opid"), col("off"))
      local.join(broadcast(offs), col("pid") === col("opid"))
        .where(col("sz") > greatest(
          coalesce(col("lmax"), lit(Long.MinValue)),
          coalesce(col("off"), lit(Long.MinValue))))
        .select(col("pc").as("price_c"), col("sz").as("size"),
                col("n_parts"))
    },

    // WEIGHTED MEDIAN (r9; r11 one-scan bracket form): the quantity-
    // weighted median price per returnflag — "the price the median
    // UNIT shipped at", not the median line. ops/WeightedMedian: the
    // collapse-first rank machinery moved ~|lineitem| rows here (the
    // price domain is near-unique — no collapse; 20.2s at 1000× vs
    // q_mad's 11s) and a naive exact-histogram bracket pays TWO full
    // scans (measured 9.5s vs 4.7s at 100× — scans dominate). Instead:
    // a deterministic BLOCK sample (the lexicographically-first part
    // files, ~3%) estimates a ±10%-quantile-margin bracket, ONE full
    // scan clamps values to the bracket and collapses map-combined
    // (out-of-bracket weight folds into two sentinel rows whose
    // running weight IS the offset), and a sentinel crossing triggers
    // the loud per-group full-range retry — exact for ANY sample.
    "q_wmedian" -> { (s, d) =>
      def slim(df: org.apache.spark.sql.DataFrame) =
        df.select(col("l_returnflag").as("g"),
                  Exact.cents(col("l_extendedprice")).as("v"),
                  round(col("l_quantity")).cast("long").as("w"))
      val full = slim(Tables(s, d, "lineitem"))
      // margin ±2% of weight: a ~3% block sample's quantile error is
      // ~0.1% on this corpus — 2% is a 20× safety factor, and every
      // extra margin point is ~100k more distinct in-bracket cents the
      // exact pass must collapse and sort (±10% measured 6.2s vs 3.9s
      // at 100×); a genuinely unlucky sample only costs the loud retry
      graft.ops.WeightedMedian
        .perGroup(full, slim(blockSample(s, d, "lineitem")), marginPct = 2)
        .select(col("g").as("l_returnflag"),
          expr("CAST(v AS DOUBLE) / 100.0").as("wmedian"),
          col("tw").as("total_w"))
    },

    // BOLLINGER BANDS (r9): trailing-7-day mean ± 2σ envelope over the
    // daily total series — the volatility-adjusted anomaly band on a
    // metric dashboard. ONE fact scan map-combines into the |days|-row
    // daily totals; each day's window membership explodes map-side off
    // that tiny table (the q_acf shape — never a global-order window);
    // window moment sums are exact (DECIMAL(38,0) squares of
    // micro-quantized daily totals) and the band arithmetic is one
    // fixed IEEE sequence. Full 7-day windows only (m = 7) — partial
    // leading windows would make the row set depend on the horizon.
    "q_bollinger" -> { (s, d) =>
      val day = 86400L * 1000 * 1000 * 1000
      val daily = Tables(s, d, "events")
        .groupBy(expr(s"ts div $day").as("idx"))
        .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      daily
        .select(col("idx"), col("x"),
          explode(array((0 to 6).map(lit(_)): _*)).as("off"))
        .select((col("idx") + col("off")).as("tgt"), col("x"))
        .join(daily.select(col("idx").as("tgt")), "tgt")
        .transform(bollingerBand)
    },

    // LAST-TOUCH ATTRIBUTION (r9): each purchase credits the user's most
    // recent preceding non-purchase event (the marketing-channel classic;
    // no prior touch = 'direct'). ONE window keyed by user under the
    // TOTAL (ts, event_id) order — a user's history is the partition,
    // never the stream — with last(..., ignoreNulls) over the strict
    // past; revenue sums exact cents (one IEEE /100 at the end). At
    // 100 TB: one key shuffle, |channels| output rows.
    "q_attribution" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, d, "events")
        .withColumn("touch",
          last(when(col("event_type") =!= "purchase", col("event_type")),
               ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
             (sum(Exact.cents(col("value"))) / 100.0).as("revenue"))
    },

    // STREAMING ATTRIBUTION (r9, streaming/Attribution): q_attribution's
    // incremental twin via flatMapGroupsWithState — each purchase is
    // credited to its channel the moment it ARRIVES, with ONE carried
    // touch per user as state (O(users), stream-length-independent; the
    // Transitions state shape). Per micro-batch the user's slice folds
    // in (ts, event_id) order: purchases emit once with the channel
    // current at that fold point (the batch window's strict-past
    // semantics), non-purchases advance the touch; the cross-batch seam
    // resolves through the carried state (AttributionSpec pins fold
    // semantics, the seam, and stream ≡ batch parity). Rollup
    // batch-side; same oracle as q_attribution.
    "stream_attribution" -> { (s, d) =>
      graft.streaming.Attribution.channelRevenue(s, d)
    },

    // STREAMING BOLLINGER (r9): the standing volatility band — the
    // |days|-row daily totals maintain as a streaming aggregation
    // (map-side merged longs per micro-batch; state is one long per
    // day), then the drained tiny table takes q_bollinger's exact
    // window-membership explode + fixed IEEE band sequence batch-side.
    // A live metric dashboard pays only the changes for the series and
    // re-derives bands from |days| rows; same oracle as the batch form.
    "stream_bollinger" -> { (s, d) =>
      import graft.streaming.StreamOps
      val day = 86400L * 1000 * 1000 * 1000
      val dailyPlan = StreamOps.fileSource(s, d, "events")
        .select(expr(s"ts div $day").as("idx"),
                floor(col("value") * 1e6).cast("long").as("vq"))
        .groupBy(col("idx")).agg(sum(col("vq")).as("x"))
      val daily = StreamOps.drainComplete(s, dailyPlan)
      daily
        .select(col("idx"), col("x"),
          explode(array((0 to 6).map(lit(_)): _*)).as("off"))
        .select((col("idx") + col("off")).as("tgt"), col("x"))
        .join(daily.select(col("idx").as("tgt")), "tgt")
        .transform(bollingerBand)
    },

    // STREAMING OLS TREND (r9): the drift monitor — per-type regression
    // of the metric on the event's DAY INDEX, maintained as a |types|-row
    // streaming aggregation of the six OLS moment sums (stream_ttest's
    // shape: DECIMAL(38,0) squares/cross-products merge map-side per
    // micro-batch), then the drained stats take q_linreg's fixed IEEE
    // finale batch-side. slope is value-units/day (the /1e6 de-quantize);
    // a standing "is this metric drifting" monitor pays only the changes.
    "stream_linreg" -> { (s, d) =>
      import graft.streaming.StreamOps
      val day = 86400L * 1000 * 1000 * 1000
      val statsPlan = StreamOps.fileSource(s, d, "events")
        .select(col("event_type"), expr(s"ts div $day").as("x"),
                floor(col("value") * 1e6).cast("long").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("x")).as("sx"), sum(col("y")).as("sy"),
             sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
             sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
             sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      StreamOps.drainComplete(s, statsPlan)
        .select(col("event_type"), col("n"),
          expr("(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / " +
               "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)")
            .as("slope_q"),
          col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"))
        .select(col("event_type"), col("n"),
          expr("slope_q / 1000000.0").as("slope"),
          expr("(CAST(sy AS DOUBLE) / n - slope_q * (CAST(sx AS DOUBLE) / n)) / 1000000.0")
            .as("intercept"),
          expr("((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) * " +
               " (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)) / " +
               "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) * " +
               " (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n))")
            .as("r2"))
    },

    // Streaming Z-SCORE (r9): q_zscore's incremental twin in the
    // stream_hh shape — the per-type moment sums (n, Σv, Σv² — the
    // DECIMAL(38,0) square accumulator merges map-side per micro-batch)
    // maintain as a |types|-row streaming aggregation in complete mode,
    // then the drained stats broadcast onto ONE batch scoring pass over
    // the table (same fixed IEEE op sequence, same total top-20 order,
    // same oracle as q_zscore). A standing anomaly monitor pays the
    // changes for stats and one scan to score.
    "stream_zscore" -> { (s, d) =>
      import graft.streaming.StreamOps
      val vq = floor(col("value") * 1e6).cast("long")
      val statsPlan = StreamOps.fileSource(s, d, "events")
        .select(col("event_type"), vq.as("vq"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("sv"),
             sum((col("vq") * col("vq")).cast("decimal(38,0)")).as("svv"))
      val stats = StreamOps.drainComplete(s, statsPlan)
        .where(col("n") > 1)
        .select(col("event_type"),
          expr("CAST(sv AS DOUBLE) / n").as("mean_q"),
          expr("sqrt((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n) / (n - 1))")
            .as("std_q"))
        .where(col("std_q") > 0.0)
      Tables(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"), vq.as("vq"))
        .join(broadcast(stats), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          ((col("vq").cast("double") - col("mean_q")) / col("std_q")).as("z"))
        .where(abs(col("z")) > lit(3.0))
        .orderBy(abs(col("z")).desc, col("event_id").asc)
        .limit(20)
    },

    // Z-SCORE anomaly screen (r9): the aggregate→broadcast-back shape —
    // per-type mean/std from exact micro-quantized sums (ONE map-side
    // combined pass), the |types|-row stats broadcast back onto the
    // facts (map-only join, zero fact shuffle), each event scored with
    // one fixed IEEE op sequence, and the top-20 outliers by |z| picked
    // via TakeOrderedAndProject under the TOTAL (|z| desc, event_id)
    // order. At 100 TB: one fact scan for stats, one for scoring —
    // never a window over the stream, never a fact-keyed exchange.
    "q_zscore" -> { (s, d) =>
      val v = floor(col("value") * 1e6).cast("long") // exact micro-units
      val ev = Tables(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"), v.as("vq"))
      val stats = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("sv"),
             // per-row squares fit a long (vq ≤ ~5.6e8 → vq² ≤ 3.2e17);
             // their SUM does not — DECIMAL(38,0) accumulator (the
             // q_gini convention; DuckDB's SUM(BIGINT)→HUGEINT mirrors)
             sum((col("vq") * col("vq")).cast("decimal(38,0)")).as("svv"))
        .where(col("n") > 1)
        .select(col("event_type"),
          expr("CAST(sv AS DOUBLE) / n").as("mean_q"),
          expr("sqrt((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n) / (n - 1))")
            .as("std_q"))
        .where(col("std_q") > 0.0)
      ev.join(broadcast(stats), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          ((col("vq").cast("double") - col("mean_q")) / col("std_q")).as("z"))
        .where(abs(col("z")) > lit(3.0))
        .orderBy(abs(col("z")).desc, col("event_id").asc)
        .limit(20)
    },

    // RFM SEGMENTATION (r9): the classic customer-value cube — per-
    // customer Recency (days to an anchor date, integer), Frequency
    // (order count) and Monetary (exact cents) metrics, each cut at its
    // EXACT global quintile boundaries, rolled up to the 5×5×5 segment
    // grid. The boundaries come from the q_percentile distributed-rank
    // machinery over the |customers|-row metric table (range partitions
    // + local row_number + broadcast offsets — never one global-order
    // window, whose single reducer would hold every customer); the
    // three 1-row cut tables broadcast back onto the metrics, so
    // bucket assignment is map-only integer comparisons. Boundary ties
    // collapse to the lower segment in BOTH engines (value comparison,
    // not rank), and every derived number is integer or one exact-long
    // division — no float accumulation anywhere. The metric table
    // recomputes per cut pass (4 fact scans total — each a pruned
    // 3-column aggregate; at 100 TB a persisted metrics temp would
    // trade one scan for triple reuse, a caller's choice).
    "q_rfm" -> { (s, d) =>
      val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
      def cust = Tables(s, d, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(max(col("o_orderdate")).as("last_ts"),
             count(lit(1)).as("freq"),
             sum(Exact.cents(col("o_totalprice"))).as("mon"))
        .select(col("custkey"),
          datediff(to_date(lit("1999-01-01")), col("last_ts").cast("date"))
            .cast("long").as("rec"),
          col("freq"), col("mon"))
      val qs = Seq(20, 40, 60, 80)
      // the 4 quintile boundaries of one metric — rankValues over a
      // constant group: equal metric values COLLAPSE to counts first, so
      // the range exchange and windows move |distinct values| rows,
      // never |customers| (the r9 monetary cut ranked raw customer rows
      // — the last remaining raw-row member of the rank family). The
      // rank-t value is tiebreak-independent, so it is exactly the
      // element the old row_number-over-(v, custkey) form picked. The
      // constant group key is non-foldable (pmod trick): a foldable
      // partition key would be stripped and the windows go global.
      def cuts(v: String, p: String): DataFrame =
        rankValues(
            cust.select(col(v), pmod(col("custkey"), lit(1)).as("gz")),
            "gz", v, qs.map(_ / 100.0), nPart)
          .select(qs.zipWithIndex.map { case (q, i) =>
            col(s"qval$i").as(s"$p$q") }: _*)
      def seg(v: String, p: String) = qs
        .map(q => (col(v) > col(s"$p$q")).cast("long"))
        .foldLeft(lit(1L): Column)(_ + _).as(s"${p}_seg")
      cust
        .crossJoin(broadcast(cuts("rec", "r")))
        .crossJoin(broadcast(cuts("freq", "f")))
        .crossJoin(broadcast(cuts("mon", "m")))
        .select(seg("rec", "r"), seg("freq", "f"), seg("mon", "m"), col("mon"))
        .groupBy(col("r_seg"), col("f_seg"), col("m_seg"))
        .agg(count(lit(1)).as("n_cust"),
             (sum(col("mon")) / 100.0).as("monetary"))
    },

    // COHORT retention (r9): users bucketed by their first active day;
    // n_users active at each day offset since. The (user, day) active
    // set is distinct BEFORE the cohort join — the join and both
    // groupBys key on user/cohort, and the retention matrix is
    // |cohorts|×|offsets| rows. Day offsets use integer `div` in both
    // engines (never a double division round-trip).
    "q_cohort" -> { (s, d) =>
      val day = 86400L * 1000 * 1000 * 1000
      val active = Tables(s, d, "events")
        .select(col("user_id"), (col("ts") - col("ts") % day).as("day_ns"))
        .distinct()
      val cohort = active.groupBy(col("user_id"))
        .agg(min(col("day_ns")).as("cohort_ns"))
      active.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_ns"),
          expr(s"(day_ns - cohort_ns) div ${day}L").as("offset_days"))
        .agg(count(lit(1)).as("n_users"))
    },

    // OHLC bars (r9): per-day open/high/low/close over the value stream
    // — the time-series downsampling primitive. open/close are min_by/
    // max_by on the (ts, event_id) struct: ONE map-side-combined shuffle
    // keyed by day (each partition contributes one candidate per day —
    // no per-day window, whose partition would hold a full day of a
    // 100 TB stream on one reducer). The (ts, event_id) composite makes
    // the pick total-ordered even when timestamps collide; values pass
    // through untouched (no float arithmetic to drift).
    "q_ohlc" -> { (s, d) =>
      val day = 86400L * 1000 * 1000 * 1000
      Tables(s, d, "events")
        .select((col("ts") - col("ts") % day).as("day_ns"),
                struct(col("ts"), col("event_id")).as("ord"), col("value"))
        .groupBy(col("day_ns"))
        .agg(min_by(col("value"), col("ord")).as("open"),
             max(col("value")).as("high"),
             min(col("value")).as("low"),
             max_by(col("value"), col("ord")).as("close"),
             count(lit(1)).as("n"))
    },

    // UNPIVOT / melt (r9): wide per-flag measures → long (flag, measure,
    // value) triples — the inverse of q_pivot and the shape every
    // generic metrics sink wants. Spark plans unpivot as Expand: each
    // input row fans to |measures| rows MAP-SIDE, zero extra shuffle —
    // and because the melt sits ABOVE the aggregate, the fan-out
    // multiplies group cardinality (3 flags), never the fact table.
    "q_unpivot" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          (sum(Exact.cents(col("l_quantity"))) / 100.0).as("qty"),
          (sum(Exact.cents(col("l_extendedprice"))) / 100.0).as("price"),
          count(lit(1)).cast("double").as("cnt"))
        .unpivot(
          Array(col("flag")),
          Array(col("qty"), col("price"), col("cnt")),
          "measure", "value")
    },

    // RANGE-frame window (r9): the value-based frame class — per
    // customer, the rolling 31-day order total, where the frame is
    // bounded by the ORDER column's VALUE (orders 30 days back),
    // not a row count. Deterministic by construction: a range frame's
    // membership ignores tie order entirely, and the sum is exact
    // cents. Same single key-partitioned shuffle as every window here.
    "q_window_range" -> { (s, d) =>
      val w = Window.partitionBy(col("custkey")).orderBy(col("day"))
        .rangeBetween(-30, Window.currentRow)
      Tables(s, d, "orders")
        .where(col("o_custkey") < 150)
        .select(col("o_custkey").as("custkey"),
          col("o_orderkey").as("orderkey"),
          datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
            .as("day"),
          Exact.cents(col("o_totalprice")).as("cents"))
        .select(col("custkey"), col("orderkey"),
          (sum(col("cents")).over(w) / 100.0).as("win_sum"),
          count(lit(1)).over(w).as("win_n"))
    },

    // EWMA smoothing (r9): per-user exponentially-weighted moving
    // average over the event stream with BINARY weights (α=1/2, depth
    // 4) — smoothing as integer arithmetic: cents div 2^k terms summed
    // as longs, so the distributed result is bit-identical to any
    // replay (SURVEY §4; a float EWMA recursion would drift with
    // partitioning). One key-partitioned window, lag-only frame —
    // state per row is 4 longs regardless of history length.
    // CHANGE-POINT detection (r14) — CUSUM single mean-shift per
    // event_type, the first step of binary segmentation: the point t
    // maximizing |S_t| where S_t = Σ_{i≤t}(v_i − mean). Computed in
    // EXACT integer arithmetic — cents-quantized values, mean cleared
    // by scaling (n·cum_t − t·total, all BIGINT, no division, no IEEE
    // anywhere) — so the argmax is order-free deterministic; ties break
    // to the earliest position. Plan: one hash exchange on event_type
    // feeding a sorted running sum + the whole-partition aggregates in
    // the same Window pass, then a 1-row-per-group rank — two window
    // passes over |events|, no self-join. Long headroom: |score| ≤
    // n·|total| — fine through ~1e9 cents-rows per group; beyond that,
    // segment first (binary segmentation does anyway).
    "q_changepoint" -> { (s, d) =>
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val g = Window.partitionBy(col("event_type"))
      val pick = Window.partitionBy(col("event_type"))
        .orderBy(col("score").desc, col("cp_pos").asc)
      Tables(s, d, "events")
        .select(col("event_type"), col("ts"), col("event_id"),
          Exact.cents(col("value")).as("vc"))
        .select(col("event_type"),
          sum(col("vc")).over(wcum).as("cum"),
          row_number().over(w).cast("long").as("cp_pos"),
          count(lit(1)).over(g).as("n"),
          sum(col("vc")).over(g).as("total"))
        .withColumn("score",
          abs(col("n") * col("cum") - col("cp_pos") * col("total")))
        .withColumn("r", row_number().over(pick))
        .where(col("r") === 1)
        .select(col("event_type"), col("cp_pos"), col("score"))
    },

    // streaming twin (r14): the CUSUM's sufficient statistic (per-type
    // n, Σvc — exact longs) STREAMS through a map-combined aggregate;
    // the ordered cumulative pass then reads the facts once with the
    // |types|-row stats broadcast back (zero fact shuffle beyond the
    // one ordered exchange) — the aggregate→broadcast-back shape every
    // stream analytic here uses. Same integer algebra, same oracle as
    // q_changepoint: the streamed statistic must land bit-identical.
    "stream_changepoint" -> { (s, d) =>
      import graft.streaming.StreamOps
      val statsPlan = StreamOps.fileSource(s, d, "events")
        .select(col("event_type"), Exact.cents(col("value")).as("vc"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("vc")).as("total"))
      val stats = StreamOps.drainComplete(s, statsPlan)
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pick = Window.partitionBy(col("event_type"))
        .orderBy(col("score").desc, col("cp_pos").asc)
      Tables(s, d, "events")
        .select(col("event_type"), col("ts"), col("event_id"),
          Exact.cents(col("value")).as("vc"))
        .select(col("event_type"),
          sum(col("vc")).over(wcum).as("cum"),
          row_number().over(w).cast("long").as("cp_pos"))
        .join(broadcast(stats), "event_type")
        .withColumn("score",
          abs(col("n") * col("cum") - col("cp_pos") * col("total")))
        .withColumn("r", row_number().over(pick))
        .where(col("r") === 1)
        .select(col("event_type"), col("cp_pos"), col("score"))
    },

    "q_ema" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          Exact.cents(col("value")).as("vc"))
        .select(col("user_id"), col("event_id"), col("vc"),
          coalesce(lag(col("vc"), 1).over(w), lit(0L)).as("l1"),
          coalesce(lag(col("vc"), 2).over(w), lit(0L)).as("l2"),
          coalesce(lag(col("vc"), 3).over(w), lit(0L)).as("l3"))
        .selectExpr("user_id", "event_id",
          "vc + (l1 div 2) + (l2 div 4) + (l3 div 8) AS ema_q")
    },

    // Co-purchase mining (r9): top-20 part pairs by joint order count —
    // the market-basket co-occurrence primitive. Self-equi-join on the
    // order key (one shuffle; per-order pair fan-out is C(k,2) with k
    // bounded by order size, so output ≈ a small constant × |lineitem|),
    // p1 < p2 canonicalizes pairs, distinct-per-order first so repeat
    // lines don't inflate counts. The global top-20 is orderBy+limit =
    // TakeOrderedAndProject (per-partition heaps, 20 rows to the
    // driver — never a global sort); (joint desc, p1, p2) is a TOTAL
    // order so the selected set is deterministic.
    "q_copurchase" -> { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("joint"))
        .orderBy(col("joint").desc, col("p1").asc, col("p2").asc)
        .limit(20)
    },

    // ASSOCIATION RULES (r9): q_copurchase extended to the full
    // support/confidence/lift mining surface. Same canonical-pair join
    // (ONE order-key shuffle, C(k,2) fan-out bounded by order width);
    // per-item order counts are a second |parts|-group aggregate that
    // joins the pair table broadcast at realistic catalog sizes (AQE
    // decides); the 1-row order total crossJoins broadcast. Every
    // statistic is a fixed IEEE op sequence over exact longs; the
    // min-support gate (joint ≥ 3) bounds the rule set and the top-20
    // by (lift desc, p1, p2) — a TOTAL order — is TakeOrderedAndProject.
    "q_assoc_rules" -> { (s, d) =>
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val itemN = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      val totN = li.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("joint"))
        .where(col("joint") >= 3)
        .join(itemN.select(col("l_partkey").as("p1"), col("cnt").as("n1")), "p1")
        .join(itemN.select(col("l_partkey").as("p2"), col("cnt").as("n2")), "p2")
        .crossJoin(broadcast(totN))
        .select(col("p1"), col("p2"), col("joint"), col("n1"), col("n2"),
          (col("joint").cast("double") / col("n_orders").cast("double"))
            .as("support"),
          (col("joint").cast("double") / col("n1").cast("double"))
            .as("conf12"),
          (col("joint").cast("double") * col("n_orders").cast("double") /
            (col("n1").cast("double") * col("n2").cast("double"))).as("lift"))
        .orderBy(col("lift").desc, col("p1").asc, col("p2").asc)
        .limit(20)
    },

    // GINI coefficient (r9): per-status inequality of order value —
    // G = (2·Σ rankᵢ·vᵢ − (n+1)·Σvᵢ) / (n·Σvᵢ) over values sorted
    // ascending. The global rank-weighted sum DECOMPOSES: with
    // per-partition local ranks l and the partition's group offset
    // O_p (rows of the group in earlier range partitions),
    // Σ rank·v = Σ_p [Σ l·v + O_p·Σv] — so ONE pass computes
    // per-(partition, group) aggregates (Σ l·v, Σv, n) and everything
    // after runs on |partitions|×|groups| rows. The first cut joined
    // broadcast offsets back to the ranked rows (the q_percentile
    // shape, which NEEDS the row at its global rank) — that evaluated
    // the range shuffle + sort TWICE and paid a 150M-row join for a
    // 3-row statistic: measured 57s at 1000×; the decomposition took
    // it to one shuffle+sort. Rank ties among equal values can't move
    // Σ rank·v (equal v ⇒ permuting ranks is a no-op). Exactness:
    // per-row cents·lrn products stay in long headroom, DECIMAL(38,0)
    // accumulators absorb any scale, and the final statistic is ONE
    // fixed IEEE op sequence over exact sums (q_stats_agg convention).
    "q_gini" -> { (s, d) =>
      val keys = Seq(col("o_orderstatus"), col("cents"), col("o_orderkey"))
      val perPart = Tables(s, d, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
                Exact.cents(col("o_totalprice")).as("cents"))
        // session parallelism, not a constant: right on local[32], and
        // a 1000-executor cluster raises it with its shuffle width
        .repartitionByRange(
          s.conf.get("spark.sql.shuffle.partitions").toInt, keys: _*)
        // the explicit per-partition sort LOOKS redundant next to the
        // rank window's own (pid, status, cents, orderkey) sort — but
        // removing it measured consistently SLOWER at 1000× (46.8s →
        // 64.6/65.8s twice): the window's sorter then ingests raw
        // shuffle output instead of a presorted run. Kept on evidence.
        .sortWithinPartitions(keys: _*)
        .withColumn("pid", spark_partition_id())
        .withColumn("lrn", row_number().over(
          Window.partitionBy(col("pid"), col("o_orderstatus"))
            .orderBy(col("cents"), col("o_orderkey"))))
        .groupBy(col("pid"), col("o_orderstatus").as("status"))
        .agg(sum((col("cents") * col("lrn")).cast("decimal(38,0)")).as("ap"),
             sum(col("cents").cast("decimal(38,0)")).as("sp"),
             count(lit(1)).as("np"))
      // ≤ |partitions|×|groups| rows from here on
      val wOff = Window.partitionBy(col("status")).orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      perPart
        .withColumn("off", coalesce(sum(col("np")).over(wOff), lit(0L)))
        .groupBy(col("status"))
        .agg(sum(col("ap")
               + col("off").cast("decimal(38,0)") * col("sp")).as("a"),
             sum(col("sp")).as("b"),
             sum(col("np")).as("n"))
        .select(col("status"), col("n"),
          ((lit(2.0) * col("a").cast("double")
            - (col("n") + 1).cast("double") * col("b").cast("double"))
           / (col("n").cast("double") * col("b").cast("double")))
            .as("gini"))
    },

    // BENFORD first-digit profile (r9): the data-quality screen — the
    // distribution of first significant digits of order values. The
    // digit extracts from the STRING of the exact cents long (never a
    // double format round-trip: long→text is identical in every
    // engine); one map-combined 9-group aggregate + a broadcast total.
    "q_benford" -> { (s, d) =>
      val c = Tables(s, d, "orders")
        .select(substring(Exact.cents(col("o_totalprice"))
          .cast("string"), 1, 1).as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val total = c.agg(sum(col("n")).as("total"))
      c.join(broadcast(total))
        .select(col("digit"), col("n"),
          (col("n").cast("double") / col("total").cast("double"))
            .as("share"))
    },

    // MODE aggregate (r9): the most frequent order priority per status,
    // with a TOTAL tie order (count desc, then priority asc) — bare
    // mode()/max_by ties are engine-undefined, the q_argmax lesson.
    // Two-level associative shape: count groupBy on the composite key
    // (map-side combined — the only fact-sized shuffle), then min_by
    // over the lexicographic (-cnt, prio) struct reduces each status's
    // candidate rows WITHOUT a window sort; at 100 TB level 2 sees
    // |statuses × priorities| rows, never facts.
    "q_mode" -> { (s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_orderstatus").as("status"),
                 col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("status"))
        .agg(min_by(struct(col("prio"), col("cnt")),
                    struct((-col("cnt")).as("nc"), col("prio"))).as("m"))
        .select(col("status"), col("m.prio").as("mode_prio"),
                col("m.cnt").as("n"))
    },

    // PageRank (r9, ops/Graph): entity importance over the symmetrized
    // supplier↔customer trade graph (distinct lineitem⋈orders pairs;
    // node ids disjoint via ×2 / ×2+1), 3 synchronous rounds, damping
    // 0.85, ranks as scaled longs — integer arithmetic end to end, so
    // the distributed result hash-matches the oracle's unrolled replay
    // exactly. Per round: two key shuffles (send on src, receive on
    // dst), per-round state |V| rows; the edge list and outdegrees are
    // computed once (see Graph.pagerank's scale notes).
    "q_pagerank" -> { (s, d) =>
      // probes the SAME standing bucketed edge table as q_bfs — one
      // corpus-level build serves every traversal (r11)
      graft.ops.Graph.pagerankOn(tradeEdges(s, d), 3)
    }
  )

  /** The symmetrized supplier↔customer trade graph as a STANDING
    * bucketed-by-src table (Graph.standingEdges): distinct lineitem ⋈
    * orders pairs, node ids disjoint via ×2 / ×2+1, symmetrized via
    * explode rather than a union of two selects (a union evaluates the
    * fact join + distinct TWICE; the explode doubles map-side in the
    * same pass — measured at 100×: ~59M distinct pairs off a 60M-row
    * fact). Built once per corpus (the table name keys on the sf dir),
    * probed by q_bfs and q_pagerank. */
  private def tradeEdges(s: SparkSession, d: String): DataFrame =
    graft.ops.Graph.standingEdges({
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("a"),
                (col("o_custkey") * 2 + 1).as("b"))
        .distinct()
      pairs.select(explode(array(
          struct(col("a").as("src"), col("b").as("dst")),
          struct(col("b").as("src"), col("a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    }, s, s"graft_trade_edges_${corpusFingerprint(s, d,
      Seq("lineitem", "orders"))}")

  /** Content fingerprint of the corpus files a standing table derives
    * from: md5 over the sorted (path, size, mtime) listing of each input
    * table's parquet files. Regenerating a fixture in place changes the
    * fingerprint and therefore the standing-table name, so stale edges
    * are never probed (the r11 dir-hashCode key was blind to content). */
  private def corpusFingerprint(s: SparkSession, d: String,
                                tables: Seq[String]): String = {
    val listing = tables.flatMap { t =>
      val p = new org.apache.hadoop.fs.Path(s"$d/$t.parquet")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      if (st.isFile) Seq(s"${p.getName}:${st.getLen}:${st.getModificationTime}")
      else fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
        .toSeq.sorted
    }.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
  }

  /** Deterministic BLOCK sample of a driver table: the lexicographically
    * first ~3% of its parquet part files (min 1; the whole table when it
    * ships as a single file — small SFs). Row-level sampling would scan
    * every file for the same estimate; reading a file subset is the only
    * sample that actually saves I/O, and the sorted listing makes it a
    * pure function of the corpus (re-evaluation-safe, like withBucket's
    * KMV boundaries). Callers own the bias story: estimation-only uses
    * with an exact verify/retry downstream (ops/WeightedMedian). */
  private def blockSample(s: SparkSession, d: String, name: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$d/$name.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files =
      if (fs.getFileStatus(p).isFile) Array(p.toString)
      else fs.listStatus(p).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    Tables.normalizeEventTime(
      s.read.parquet(files.take(math.max(1, files.length / 32)): _*))
  }

  /** The Bollinger band finale shared by q_bollinger/stream_bollinger,
    * over per-window (tgt, member x) rows. The variance NUMERATOR
    * m·Σx² − (Σx)² is computed in EXACT decimal arithmetic and cast to
    * double ONCE: the r9 form cast Σx² (~1e21 at tiny SF — far past
    * 2^53) and then SUBTRACTED near-equal doubles, so the cancellation
    * amplified a 1-ulp cast difference between engines into visible
    * drift (DuckDB's hugeint→double is two roundings, not one; found
    * live running the full gate at sf0.001). With the exact numerator
    * there is no cancellation after the cast, and the 4-decimal output
    * rounding absorbs the residual ≤1-ulp divergence. */
  private def bollingerBand(grouped: DataFrame): DataFrame =
    grouped
      .groupBy(col("tgt"))
      .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
           // a DAILY TOTAL squares past long headroom even at small
           // SF (unlike per-row products elsewhere) — widen BEFORE
           // the multiply, not just the sum
           sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      .where(col("m") === 7)
      .withColumn("vnum",
        expr("m * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .select(col("tgt").as("day_idx"),
        expr("ROUND(CAST(sx AS DOUBLE) / m / 1000000.0, 4)").as("mean"),
        expr("ROUND((CAST(sx AS DOUBLE) / m + 2.0 * " +
             "sqrt(CAST(vnum AS DOUBLE) / m / (m - 1))) / 1000000.0, 4)")
          .as("upper"),
        expr("ROUND((CAST(sx AS DOUBLE) / m - 2.0 * " +
             "sqrt(CAST(vnum AS DOUBLE) / m / (m - 1))) / 1000000.0, 4)")
          .as("lower"))

  /** Monotone VALUE-DERIVED bucket id in [0, nPart), EQUI-DEPTH and
    * deterministic. This replaces repartitionByRange +
    * spark_partition_id() in the offset machinery: sampled range
    * boundaries are seeded by physical rdd ids, so the offsets branch —
    * which re-evaluates its exchange (join null-filters defeat reuse) —
    * could bucket differently from the rows branch and misalign the
    * prefix totals (found LIVE in r9: q_mwu's exact integer sum drifted
    * across runs; DeterminismSpec pins the fix). The r9 cut split the
    * VALUE RANGE ((v−lo)·nPart div (hi−lo+1)) — deterministic but
    * skew-sensitive: a heavy-tailed distribution (log-normal revenue)
    * lands most rows in a few buckets and the per-bucket window degrades
    * toward one reducer. This cut derives EQUI-DEPTH boundaries, still
    * purely from the data so every evaluation buckets identically:
    *  1. per-distinct-value row weights (map-combined count — the weight
    *     that matters is the number of INPUT rows a bucket will carry
    *     into its window);
    *  2. a KMV-style deterministic uniform sample of distinct values —
    *     the 128·nPart smallest xxhash64 values (TakeOrderedAndProject,
    *     per-partition heaps; a pure function of the data, no rng, no
    *     rdd ids) with their exact weights. When |distinct| ≤ the sample
    *     cap this is the ENTIRE histogram and the depths are exact;
    *  3. weighted cumulative over the sample in value order (a ≤128·nPart
    *     row window on a non-foldable constant partition) → the boundary
    *     value opening each equal-weight step;
    *  4. pid = |{boundaries ≤ v}| via a broadcast sorted array and a
    *     codegen HOF — monotone in v by construction.
    * Equal values always share a bucket (boundaries are data values), so
    * per-bucket windows with any tiebreak stay total; a single value
    * heavier than W/nPart cannot be split by ANY order-preserving
    * partitioner — it occupies one bucket and the neighbors stay
    * balanced, which is the best possible outcome. */
  private[graft] def withBucket(df: DataFrame, value: String,
                                nPart: Int): DataFrame = {
    val sampleK = 128 * nPart
    // ONE materialization of the input: every caller passes a COLLAPSED
    // frame (distinct values with counts — small), but its derivation is
    // typically a map-combined aggregate of the raw fact, and without
    // this it re-evaluates once per consuming subtree — the boundary
    // sample below, the bucketed output, and the offset machinery's own
    // branches downstream (the q_gini 2x-evaluation lesson; join
    // null-filters defeat exchange reuse). localCheckpoint pins the
    // collapsed rows to local storage so every branch re-reads |distinct
    // values| rows instead of re-scanning the fact (measured at 1000x:
    // q_wmedian 29.5s -> re-benched after this change; the r9 form paid
    // the same double scan for its min/max agg).
    // deserialized default on purpose: the A/B at 1000× (q_wmedian,
    // whose "collapsed" domain stays fact-scale) measured
    // MEMORY_AND_DISK_SER at +16% — with memory to hold the blocks,
    // per-branch re-read deserialization costs more than the heap
    // footprint saves (contrast LineageTable.checkpointed, where the
    // pinned frame OOMed as live objects)
    val d = df.localCheckpoint()
    val w = d.groupBy(col(value)).agg(count(lit(1)).as("_w"))
      .withColumn("_h", xxhash64(col(value)))
    // total order (hash, value) — hash ties cannot make the cut unstable
    val samp = w.orderBy(col("_h"), col(value)).limit(sampleK)
    // the window partitions on a NON-FOLDABLE constant: a foldable key
    // is stripped by the optimizer and the window silently goes global
    // on a plain orderBy (the documented lit(0) trap)
    val one = pmod(col("_h"), lit(1))
    val wCum = Window.partitionBy(one).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bounds = samp
      .withColumn("_cw", sum(col("_w")).over(wCum))
      .withColumn("_tw", sum(col("_w")).over(Window.partitionBy(one)))
      .withColumn("_b", expr(s"((_cw - 1) * $nPart) div _tw"))
      .where(col("_b") >= 1)
      .groupBy(col("_b")).agg(min(col(value)).as("_bv"))
      .agg(sort_array(collect_list(col("_bv"))).as("_bs"))
    d.crossJoin(broadcast(bounds))
      .withColumn("pid",
        size(filter(col("_bs"), x => x <= col(value))))
      .drop("_bs")
  }

  /** The two-sample cumulative table shared by q_ks and q_mwu: view vs
    * click values collapse to (vq, c1, c2) map-side, range partition in
    * value order, per-partition running sums of BOTH counters +
    * broadcast prefix offsets (partition totals read off the running
    * maxima — the q_wmedian trick, so the offsets subtree keeps the
    * window). Returns one row per distinct value: (vq, c1, c2, a1, a2,
    * n1, n2) with a_i the INCLUSIVE cumulative counts — everything an
    * EDF statistic needs, all exact integers. */
  private def twoSampleCum(s: SparkSession, d: String): DataFrame = {
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
    val c = Tables(s, d, "events")
      .where(col("event_type").isin("view", "click"))
      .select(col("event_type"),
        floor(col("value") * 1e6).cast("long").as("vq"))
      .groupBy(col("vq"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
             .as("c1"),
           sum(when(col("event_type") === "click", 1L).otherwise(0L))
             .as("c2"))
    val parts = withBucket(c, "vq", nPart)
    val w = Window.partitionBy(col("pid")).orderBy(col("vq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts
      .withColumn("l1", sum(col("c1")).over(w))
      .withColumn("l2", sum(col("c2")).over(w))
    val hist = local.groupBy(col("pid"))
      .agg(max(col("l1")).as("p1"), max(col("l2")).as("p2"))
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist
      .withColumn("o1", coalesce(sum(col("p1")).over(wOff), lit(0L)))
      .withColumn("o2", coalesce(sum(col("p2")).over(wOff), lit(0L)))
      .select(col("pid").as("opid"), col("o1"), col("o2"))
    val tot = c.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    local.join(broadcast(offs), col("pid") === col("opid"))
      .crossJoin(broadcast(tot))
      .select(col("vq"), col("c1"), col("c2"),
        (col("l1") + col("o1")).as("a1"), (col("l2") + col("o2")).as("a2"),
        col("n1"), col("n2"))
  }

  /** Value at global rank ceil(q·n) per group — the q_percentile
    * distributed-rank machinery factored for reuse (q_mad runs it
    * twice), with one scale upgrade: EQUAL VALUES COLLAPSE to
    * (group, value, count) FIRST (a map-combined aggregate), so the
    * range exchange and windows move |distinct values| rows, never
    * |rows| — at 1000× this took q_mad's fact-sized double range sort
    * out of the plan entirely (92s → re-measured after, see
    * BENCH_SCALE1000). The value at rank t is the unique collapsed row
    * whose cumulative-count interval (cc−cnt, cc] contains t — provably
    * identical to the row-rank pick under ANY tiebreak, because rank t
    * falls inside one value's run. Returns (group, qval). */
  private def rankValue(df: DataFrame, group: String, value: String,
                        q: Double, nPart: Int): DataFrame =
    rankValues(df, group, value, Seq(q), nPart)
      .withColumnRenamed("qval0", "qval")

  /** [[rankValue]] generalized to MANY quantiles per group off ONE
    * collapsed cumulative table: the collapse, range exchange, windows
    * and offset broadcast are all built once, and each requested rank is
    * one more conditional aggregate over the same |distinct values| rows
    * — k quantiles cost one quantile plus k cheap finales, never k rank
    * passes (q_percentile asks for p50 AND p95). Returns
    * (group, qval0..qval{k-1}) in `qs` order. */
  private def rankValues(df: DataFrame, group: String, value: String,
                         qs: Seq[Double], nPart: Int): DataFrame = {
    val c = df.groupBy(col(group), col(value)).agg(count(lit(1)).as("cnt"))
    val parts = withBucket(c, value, nPart)
    val wLocal = Window.partitionBy(col("pid"), col(group))
      .orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts.withColumn("lcc", sum(col("cnt")).over(wLocal))
    // partition-group count totals from the collapsed table directly —
    // no window, so `local` stays single-consumer (the q_wmedian r11
    // restructure; the r10 running-maxima read ran the window twice)
    val hist = parts.groupBy(col("pid"), col(group))
      .agg(sum(col("cnt")).as("pc"))
    val wOff = Window.partitionBy(col(group)).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist
      .withColumn("off", coalesce(sum(col("pc")).over(wOff), lit(0L)))
      .withColumn("n",
        sum(col("pc")).over(Window.partitionBy(col(group))))
      .select(col("pid").as("opid"), col(group).as("og"),
              col("off"), col("n"))
    val cum = local
      .join(broadcast(offs),
        col("pid") === col("opid") && col(group) === col("og"))
      .withColumn("cc", col("lcc") + col("off"))
    // the value at rank t is the unique collapsed row whose
    // cumulative-count interval (cc−cnt, cc] contains t
    def hit(q: Double): Column = {
      val t = ceil(lit(q) * col("n")).cast("long")
      col("cc") >= t && col("cc") - col("cnt") < t
    }
    val picks = qs.zipWithIndex.map { case (q, i) =>
      max(when(hit(q), col(value))).as(s"qval$i") }
    cum.where(qs.map(hit).reduce(_ || _))
      .groupBy(col(group))
      .agg(picks.head, picks.tail: _*)
  }

  /** The skewed heavy-hitter fixture column: half the mass in 3 hot
    * items, the rest singletons — shared by the batch and streaming
    * heavy-hitter queries so their oracles coincide. */
  private def skewedItems(orders: DataFrame): DataFrame =
    orders.select(
      when(col("o_orderkey") % 2 === 0,
        concat(lit("hot_"), (col("o_orderkey") % 3).cast("string")))
        .otherwise(concat(lit("cold_"), col("o_orderkey").cast("string")))
        .as("item"))

  /** Pass 2 of the exact two-pass heavy-hitter plan: exact counts of the
    * ≤k sketch candidates (bounded IN filter + ≤k-group aggregate),
    * reported above the n/16 threshold. */
  private def exactRecount(src: DataFrame, cand: Seq[String]): DataFrame = {
    val total = src.agg(count(lit(1)).as("n"))
    src.where(col("item").isin(cand: _*))
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(total))
      .where(col("cnt") * 16 > col("n"))
      .select(col("item"), col("cnt"))
  }

  val oracleSql: Map[String, String] = Map(
    // layout is never semantics: the bucketed join's oracle is a plain join
    "q_bucketed_join" ->
      """SELECT l_orderkey AS orderkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  MIN(o_orderstatus) AS status
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_orderkey % 50 = 0
        |GROUP BY 1""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(10,6))), 4) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(10,6)) AS DECIMAL(25,8)) * CAST(1+l_tax AS DECIMAL(10,6))), 4) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join_topn" ->
      """SELECT l_orderkey AS orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(10,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, orderkey ASC
        |LIMIT 10""".stripMargin,

    "q5_join_multi" ->
      """SELECT n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(10,6))), 4) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |  CAST(row_number() OVER w AS BIGINT) AS rnk,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
        |       OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
        |FROM orders
        |WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,

    "q_set_ops" ->
      """SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        |  AND o_orderdate < TIMESTAMP '2002-01-01'""".stripMargin,

    // standard precedence: INTERSECT binds tighter than EXCEPT — same
    // grouping as the method chain
    "q_set_ops_all" ->
      """SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        |  AND o_orderdate < TIMESTAMP '2002-01-01'""".stripMargin,

    "q_lag_lead" ->
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,

    "q_window_cume" ->
      """SELECT o_orderkey AS orderkey, o_orderstatus AS status,
        |  o_totalprice AS totalprice,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WHERE o_orderkey <= 3000
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)""".stripMargin,

    "q_distinct_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(DISTINCT o_orderstatus) AS n_status,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |         DATE '1995-01-01' + CAST(event_id % 2400 AS INTEGER) AS event_date
        |  FROM events WHERE event_id % 20 = 0),
        |j AS (
        |  SELECT ev.*, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |    row_number() OVER (PARTITION BY event_id
        |                       ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey DESC) AS _rn
        |  FROM ev JOIN orders ON user_id = o_custkey
        |                      AND CAST(o_orderdate AS DATE) <= event_date)
        |SELECT event_id, user_id, event_date,
        |       o_orderkey AS matched_order, o_date AS matched_date
        |FROM j WHERE _rn = 1""".stripMargin,

    // nearest on either side; total tiebreak mirrors the Spark window
    "q_asof_nearest" ->
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |         DATE '1995-01-01' + CAST(event_id % 2400 AS INTEGER) AS event_date
        |  FROM events WHERE event_id % 20 = 0),
        |j AS (
        |  SELECT ev.*, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |    row_number() OVER (PARTITION BY event_id
        |      ORDER BY ABS(CAST(o_orderdate AS DATE) - event_date) ASC,
        |               CAST(o_orderdate AS DATE) ASC, o_orderkey ASC) AS _rn
        |  FROM ev JOIN orders ON user_id = o_custkey)
        |SELECT event_id, user_id, event_date,
        |       o_orderkey AS matched_order, o_date AS matched_date,
        |       CAST(o_date - event_date AS BIGINT) AS gap_days
        |FROM j WHERE _rn = 1""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,

    "q_moving_agg" ->
      """SELECT user_id, epoch_ns(ts) AS ts,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_ns(ts)
        |    RANGE BETWEEN 604800000000000 PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS week_value
        |FROM events WHERE user_id < 200""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2001-01-01')""".stripMargin,

    "q_semi_join" ->
      """SELECT s_suppkey, s_nationkey FROM supplier
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey
        |    AND l_shipdate > TIMESTAMP '1998-09-02')""".stripMargin,

    "q_events_window" ->
      """SELECT epoch_ns(ts) - (epoch_ns(ts) % 3600000000000) AS window_start_ns,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_range_join" ->
      """WITH periods AS (
        |  SELECT i AS period_id,
        |         1704067200000000000 + i * 61200000000000 AS lo_ns,
        |         1704067200000000000 + i * 61200000000000
        |           + (10800000000000 + (i % 5) * 25200000000000) - 1 AS hi_ns
        |  FROM range(0, 40) t(i))
        |SELECT p.period_id, COUNT(*) AS n,
        |       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM periods p JOIN events e
        |  ON epoch_ns(e.ts) BETWEEN p.lo_ns AND p.hi_ns
        |GROUP BY 1""".stripMargin,

    "q_skew_join" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(10,6))), 4) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1""".stripMargin,

    "q_outer_join" ->
      """WITH cust AS (
        |  SELECT c_custkey AS custkey, c_mktsegment
        |  FROM customer WHERE c_mktsegment = 'MACHINERY'),
        |ord AS (
        |  SELECT o_custkey AS custkey, COUNT(*) AS n_orders
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        |  GROUP BY 1)
        |SELECT COALESCE(cust.custkey, ord.custkey) AS custkey,
        |  cust.c_mktsegment IS NOT NULL AS in_segment,
        |  COALESCE(ord.n_orders, 0) AS n_orders
        |FROM cust FULL OUTER JOIN ord ON cust.custkey = ord.custkey""".stripMargin,

    "q_percentile" ->
      """WITH r AS (SELECT o_orderstatus, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |                     ORDER BY o_totalprice, o_orderkey) AS rn,
        |  COUNT(*) OVER (PARTITION BY o_orderstatus) AS n FROM orders)
        |SELECT o_orderstatus,
        |  MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
        |      THEN o_totalprice END) AS p50,
        |  MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
        |      THEN o_totalprice END) AS p95
        |FROM r GROUP BY 1""".stripMargin,

    // the argmax oracle picks the same deterministic row via explicit
    // tie-broken row_numbers (arg_max/arg_min tie behavior is undefined)
    "q_argmax" ->
      """WITH r AS (SELECT o_orderstatus, o_totalprice, o_orderkey,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rmax,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |                     ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderstatus AS status,
        |  MAX(CASE WHEN rmax = 1 THEN o_totalprice END) AS max_price,
        |  MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS argmax_key,
        |  MAX(CASE WHEN rmin = 1 THEN o_totalprice END) AS min_price,
        |  MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS argmin_key
        |FROM r GROUP BY 1""".stripMargin,

    // same correlated text the engine runs — DuckDB decorrelates it too
    // the same statement verbatim — DuckDB's lateral semantics must
    // agree row-for-row, including the deterministic cut
    "q_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey AND o_totalprice > 250000.0
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
        |WHERE c.c_custkey % 3 = 0""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o.o_custkey AS custkey, o.o_orderkey AS orderkey,
        |       o.o_totalprice AS totalprice
        |FROM orders o
        |WHERE o.o_custkey < 300
        |  AND o.o_totalprice > 1.5 * (
        |    SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |           / COUNT(*)
        |    FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin,

    // the oracle mirrors the engine exactly: exact integer power sums
    // (DECIMAL cents → BIGINT; DuckDB SUMs them in HUGEINT, still exact),
    // then the SAME textual double formula — identical IEEE op sequence,
    // identical bits
    "q_stats_agg" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sx,
        |    SUM(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sy,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      * CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sxx,
        |    SUM(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      * CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS syy,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      * CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(sx AS DOUBLE) / n / 100 AS avg_qty,
        |  sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) / 100 AS std_qty,
        |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1) / 10000 AS covar_qd,
        |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)) AS corr_qd
        |FROM m""".stripMargin,

    "q_exists_subquery" ->
      """SELECT c.c_custkey AS custkey, c.c_mktsegment AS mktsegment,
        |       c.c_acctbal AS acctbal
        |FROM customer c
        |WHERE c.c_custkey < 500
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_totalprice > 50 * c.c_acctbal)""".stripMargin,

    // bloom pruning is pure physical optimization: the oracle is the join
    "q_bloom_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1997-03-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |GROUP BY 1""".stripMargin,

    // the oracle takes the expensive declarative path the sketch avoids:
    // full DISTINCT then ORDER BY ... LIMIT k — same exact order
    // statistics, so the one-pass bounded-buffer aggregate must agree
    // bit-for-bit (same hash, same IEEE estimate arithmetic). The CASE
    // mirrors KMinValues.ndvEstimate's sub-k exact answer, keeping both
    // sides total over any cardinality.
    "q_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT
        |    CAST(('0x'||substr(md5(CAST(l_orderkey AS VARCHAR)),1,15)) AS BIGINT) AS h
        |  FROM lineitem),
        |km AS (SELECT h FROM h ORDER BY h LIMIT 256)
        |SELECT CAST(256 AS BIGINT) AS k,
        |       MAX(h) AS kth_min,
        |       CASE WHEN (SELECT COUNT(*) FROM km) < 256
        |            THEN (SELECT COUNT(*) FROM km)
        |            ELSE CAST(floor(255.0 * pow(2, 60) / MAX(h)) AS BIGINT)
        |       END AS est_distinct,
        |       (SELECT COUNT(*) FROM h) AS n_exact
        |FROM km""".stripMargin,

    // the oracle takes the exact one-pass GROUP BY the sketch exists to
    // avoid: every item above the n/16 threshold with its exact count —
    // the two-pass engine plan must land identical
    "q_heavy_hitters" ->
      """WITH src AS (
        |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'hot_' || (o_orderkey % 3)
        |              ELSE 'cold_' || o_orderkey END AS item
        |  FROM orders)
        |SELECT item, COUNT(*) AS cnt FROM src GROUP BY item
        |HAVING COUNT(*) * 16 > (SELECT COUNT(*) FROM src)""".stripMargin,

    // the streaming sketch only changes where candidates come from — the
    // exact recount reports the identical rollup
    "stream_hh" ->
      """WITH src AS (
        |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'hot_' || (o_orderkey % 3)
        |              ELSE 'cold_' || o_orderkey END AS item
        |  FROM orders)
        |SELECT item, COUNT(*) AS cnt FROM src GROUP BY item
        |HAVING COUNT(*) * 16 > (SELECT COUNT(*) FROM src)""".stripMargin,

    // dense (user, day) grid from the observed bounds; zero-filled counts;
    // per-row floor(value*1e6) long quantization BEFORE the sum makes the
    // daily rollup associative and hash-exact across both engines
    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, epoch_ns(ts) - epoch_ns(ts) % 86400000000000 AS day_ns,
        |         COUNT(*) AS n,
        |         CAST(SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_q
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(day_ns) AS lo, MAX(day_ns) AS hi FROM daily),
        |spine AS (SELECT unnest(range(b.lo, b.hi + 1, 86400000000000)) AS day_ns
        |          FROM b),
        |grid AS (SELECT u.user_id, s.day_ns
        |         FROM (SELECT DISTINCT user_id FROM daily) u, spine s)
        |SELECT g.user_id, g.day_ns,
        |  CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
        |  last_value(d.sum_q IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day_ns
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_q
        |FROM grid g LEFT JOIN daily d
        |  ON g.user_id = d.user_id AND g.day_ns = d.day_ns""".stripMargin,

    // each stage's min timestamp must be strictly after the previous
    // stage's — the ordered-funnel contract
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
        |s1 AS (SELECT user_id, MIN(tns) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(tns) AS t2 FROM e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'click' AND tns > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(tns) AS t3 FROM e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE event_type = 'purchase' AND tns > t2 GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS stage, COUNT(*) AS n_users FROM s1
        |UNION ALL SELECT CAST(2 AS BIGINT), COUNT(*) FROM s2
        |UNION ALL SELECT CAST(3 AS BIGINT), COUNT(*) FROM s3""".stripMargin,

    // the incremental operator must land exactly where the batch funnel
    // does — same oracle as q_funnel
    "stream_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
        |s1 AS (SELECT user_id, MIN(tns) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(tns) AS t2 FROM e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'click' AND tns > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(tns) AS t3 FROM e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE event_type = 'purchase' AND tns > t2 GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS stage, COUNT(*) AS n_users FROM s1
        |UNION ALL SELECT CAST(2 AS BIGINT), COUNT(*) FROM s2
        |UNION ALL SELECT CAST(3 AS BIGINT), COUNT(*) FROM s3""".stripMargin,

    // successor pairs under the same total (tns, event_id) order; p is
    // one division of two exact integers in both engines
    "q_markov" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id,
        |             event_type FROM events),
        |pr AS (SELECT event_type AS src,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY tns ASC, event_id ASC) AS dst
        |       FROM e),
        |c AS (SELECT src, dst, COUNT(*) AS n FROM pr
        |      WHERE dst IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT src, SUM(n) AS tot FROM c GROUP BY 1)
        |SELECT c.src, c.dst, c.n,
        |       CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
        |FROM c JOIN t ON c.src = t.src""".stripMargin,

    // the incremental edge stream must land exactly where the batch
    // lead() pairing does — same oracle as q_markov
    "stream_markov" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id,
        |             event_type FROM events),
        |pr AS (SELECT event_type AS src,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY tns ASC, event_id ASC) AS dst
        |       FROM e),
        |c AS (SELECT src, dst, COUNT(*) AS n FROM pr
        |      WHERE dst IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT src, SUM(n) AS tot FROM c GROUP BY 1)
        |SELECT c.src, c.dst, c.n,
        |       CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
        |FROM c JOIN t ON c.src = t.src""".stripMargin,

    // same micro-quantized exact sums (SUM(BIGINT)->HUGEINT is exact),
    // same textual IEEE op sequence for mean/std/z; (|z| desc, event_id)
    // is a total order so the LIMIT set is deterministic
    "q_zscore" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |             CAST(floor(value * 1e6) AS BIGINT) AS vq FROM events),
        |s AS (SELECT event_type, COUNT(*) AS n, SUM(vq) AS sv,
        |        SUM(vq * vq) AS svv FROM e GROUP BY 1),
        |st AS (SELECT event_type, CAST(sv AS DOUBLE) / n AS mean_q,
        |         sqrt((CAST(svv AS DOUBLE)
        |           - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n) / (n - 1))
        |           AS std_q
        |       FROM s WHERE n > 1)
        |SELECT e.event_id, e.event_type, e.value,
        |       (CAST(e.vq AS DOUBLE) - st.mean_q) / st.std_q AS z
        |FROM e JOIN st ON e.event_type = st.event_type
        |WHERE st.std_q > 0
        |  AND abs((CAST(e.vq AS DOUBLE) - st.mean_q) / st.std_q) > 3.0
        |ORDER BY abs((CAST(e.vq AS DOUBLE) - st.mean_q) / st.std_q) DESC,
        |         e.event_id ASC
        |LIMIT 20""".stripMargin,

    // same exact moment sums, same textual Welch formula — the single
    // output row matches bitwise
    "q_ttest" ->
      """WITH e AS (SELECT event_type,
        |             CAST(floor(value * 1e6) AS BIGINT) AS vq FROM events
        |           WHERE event_type IN ('view', 'click')),
        |s AS (SELECT event_type, COUNT(*) AS n, SUM(vq) AS sv,
        |        SUM(vq * vq) AS svv FROM e GROUP BY 1),
        |a AS (SELECT n AS n1, sv AS sv1, svv AS svv1 FROM s
        |      WHERE event_type = 'view'),
        |b AS (SELECT n AS n2, sv AS sv2, svv AS svv2 FROM s
        |      WHERE event_type = 'click')
        |SELECT n1, n2,
        |  CAST(sv1 AS DOUBLE) / n1 / 1000000.0 AS mean1,
        |  CAST(sv2 AS DOUBLE) / n2 / 1000000.0 AS mean2,
        |  (CAST(sv1 AS DOUBLE) / n1 - CAST(sv2 AS DOUBLE) / n2) /
        |  sqrt((CAST(svv1 AS DOUBLE) - CAST(sv1 AS DOUBLE) * CAST(sv1 AS DOUBLE) / n1) / (n1 - 1) / n1 +
        |       (CAST(svv2 AS DOUBLE) - CAST(sv2 AS DOUBLE) * CAST(sv2 AS DOUBLE) / n2) / (n2 - 1) / n2) AS z
        |FROM a, b""".stripMargin,

    // the streamed moment sums ARE the batch sums — same oracle as q_ttest
    "stream_ttest" ->
      """WITH e AS (SELECT event_type,
        |             CAST(floor(value * 1e6) AS BIGINT) AS vq FROM events
        |           WHERE event_type IN ('view', 'click')),
        |s AS (SELECT event_type, COUNT(*) AS n, SUM(vq) AS sv,
        |        SUM(vq * vq) AS svv FROM e GROUP BY 1),
        |a AS (SELECT n AS n1, sv AS sv1, svv AS svv1 FROM s
        |      WHERE event_type = 'view'),
        |b AS (SELECT n AS n2, sv AS sv2, svv AS svv2 FROM s
        |      WHERE event_type = 'click')
        |SELECT n1, n2,
        |  CAST(sv1 AS DOUBLE) / n1 / 1000000.0 AS mean1,
        |  CAST(sv2 AS DOUBLE) / n2 / 1000000.0 AS mean2,
        |  (CAST(sv1 AS DOUBLE) / n1 - CAST(sv2 AS DOUBLE) / n2) /
        |  sqrt((CAST(svv1 AS DOUBLE) - CAST(sv1 AS DOUBLE) * CAST(sv1 AS DOUBLE) / n1) / (n1 - 1) / n1 +
        |       (CAST(svv2 AS DOUBLE) - CAST(sv2 AS DOUBLE) * CAST(sv2 AS DOUBLE) / n2) / (n2 - 1) / n2) AS z
        |FROM a, b""".stripMargin,

    // single-node moment sums are the same exact integers; slope computes
    // once in the CTE and intercept/r2 reference it — the identical
    // shared-value reuse the Spark side performs
    "q_linreg" ->
      """WITH m AS (SELECT l_returnflag,
        |             CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |           FROM lineitem),
        |s AS (SELECT l_returnflag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
        |      FROM m GROUP BY 1),
        |t AS (SELECT l_returnflag, n,
        |        (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) /
        |        (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) AS slope,
        |        sx, sy, sxx, syy, sxy FROM s)
        |SELECT l_returnflag, n, slope,
        |  (CAST(sy AS DOUBLE) / n - slope * (CAST(sx AS DOUBLE) / n)) / 100.0 AS intercept,
        |  ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) *
        |   (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)) /
        |  ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) *
        |   (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)) AS r2
        |FROM t""".stripMargin,

    // exact cell/marginal counts; expected computes once and contrib
    // references it, as on the Spark side
    "q_chi2" ->
      """WITH cells AS (SELECT o_orderstatus AS status, o_orderpriority AS prio,
        |                 COUNT(*) AS obs FROM orders GROUP BY 1, 2),
        |r AS (SELECT status, SUM(obs) AS rt FROM cells GROUP BY 1),
        |c AS (SELECT prio, SUM(obs) AS ct FROM cells GROUP BY 1),
        |t AS (SELECT SUM(obs) AS total FROM cells),
        |e AS (SELECT status, prio, obs,
        |        CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / total AS expected
        |      FROM cells JOIN r USING (status) JOIN c USING (prio)
        |      CROSS JOIN t)
        |SELECT status, prio, obs, expected,
        |  (obs - expected) * (obs - expected) / expected AS contrib
        |FROM e""".stripMargin,

    // the streamed cells ARE the batch cells — same oracle as q_chi2
    "stream_chi2" ->
      """WITH cells AS (SELECT o_orderstatus AS status, o_orderpriority AS prio,
        |                 COUNT(*) AS obs FROM orders GROUP BY 1, 2),
        |r AS (SELECT status, SUM(obs) AS rt FROM cells GROUP BY 1),
        |c AS (SELECT prio, SUM(obs) AS ct FROM cells GROUP BY 1),
        |t AS (SELECT SUM(obs) AS total FROM cells),
        |e AS (SELECT status, prio, obs,
        |        CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / total AS expected
        |      FROM cells JOIN r USING (status) JOIN c USING (prio)
        |      CROSS JOIN t)
        |SELECT status, prio, obs, expected,
        |  (obs - expected) * (obs - expected) / expected AS contrib
        |FROM e""".stripMargin,

    // declarative triangle count: each triangle once via lo<hi edge
    // ordering (e1=(a,b), e2=(b,c), e3=(a,c)) — same integer the
    // degree-oriented plan produces
    "q_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |                         AND a.l_partkey < b.l_partkey),
        |d AS (SELECT v, COUNT(*) AS deg
        |      FROM (SELECT lo AS v FROM e UNION ALL SELECT hi FROM e)
        |      GROUP BY 1),
        |tri AS (SELECT COUNT(*) AS n_tri FROM e e1
        |        JOIN e e2 ON e2.lo = e1.hi
        |        JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
        |nd AS (SELECT COUNT(*) AS n_nodes,
        |         CAST(SUM(deg * (deg - 1)) AS BIGINT) AS w2 FROM d),
        |ed AS (SELECT COUNT(*) AS n_edges FROM e)
        |SELECT n_nodes, n_edges, w2 // 2 AS n_wedges, n_tri,
        |  CAST(3 * n_tri AS DOUBLE) / CAST(w2 // 2 AS DOUBLE) AS transitivity
        |FROM nd, ed, tri""".stripMargin,

    // same daily counts, same lag pairing, same fixed IEEE sequence over
    // the exact moment sums
    "q_acf" ->
      """WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS idx,
        |                 COUNT(*) AS cnt FROM events GROUP BY 1),
        |probe AS (SELECT idx + k AS yidx, k, cnt AS x FROM daily
        |          CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7]) AS k)),
        |p AS (SELECT pr.k, pr.x, d.cnt AS y FROM probe pr
        |      JOIN daily d ON d.idx = pr.yidx),
        |s AS (SELECT k, COUNT(*) AS m, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
        |      FROM p GROUP BY 1)
        |SELECT CAST(k AS BIGINT) AS lag, m,
        |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / m) /
        |  sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / m) *
        |  (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / m)) AS acf
        |FROM s""".stripMargin,

    // single-node exact ranks pick the same integers; only the /1e6
    // re-scale is IEEE
    "q_mad" ->
      """WITH e AS (SELECT event_type,
        |             CAST(floor(value * 1e6) AS BIGINT) AS vq, event_id
        |           FROM events),
        |r1 AS (SELECT event_type, vq,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY vq, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n FROM e),
        |med AS (SELECT event_type,
        |          MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
        |              THEN vq END) AS med_q
        |        FROM r1 GROUP BY 1),
        |dev AS (SELECT e.event_type, abs(e.vq - m.med_q) AS dq, e.event_id
        |        FROM e JOIN med m USING (event_type)),
        |r2 AS (SELECT event_type, dq,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY dq, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n FROM dev),
        |mad AS (SELECT event_type,
        |          MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
        |              THEN dq END) AS mad_q
        |        FROM r2 GROUP BY 1)
        |SELECT event_type,
        |  CAST(med_q AS DOUBLE) / 1000000.0 AS median,
        |  CAST(mad_q AS DOUBLE) / 1000000.0 AS mad
        |FROM med JOIN mad USING (event_type)""".stripMargin,

    // same two-level exact counts; 1 − Σc²/n² is the identical op
    // sequence; user_id tiebreak makes the top-20 total-ordered
    "q_diversity" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS c
        |           FROM events GROUP BY 1, 2),
        |u AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
        |        COUNT(*) AS n_types, SUM(c*c) AS ss FROM c GROUP BY 1)
        |SELECT user_id, n, n_types,
        |  1.0 - CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |    AS simpson
        |FROM u
        |ORDER BY simpson DESC, user_id ASC
        |LIMIT 20""".stripMargin,

    // the recursive CTE walks the same symmetrized graph: UNION dedups
    // (node, dist) per level so the working set is frontier-like, and
    // min-dist per node is exactly BFS's first-visit distance
    "q_bfs" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT l_suppkey * 2 AS a, o_custkey * 2 + 1 AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a AS src, b AS dst FROM pairs
        |      UNION ALL SELECT b, a FROM pairs),
        |seed AS (SELECT MIN(src) AS node FROM e),
        |walk AS (SELECT node, 0 AS dist FROM seed
        |         UNION
        |         SELECT e.dst, w.dist + 1 FROM walk w
        |         JOIN e ON e.src = w.node WHERE w.dist < 3),
        |best AS (SELECT node, MIN(dist) AS dist FROM walk GROUP BY 1)
        |SELECT CAST(dist AS BIGINT) AS dist, COUNT(*) AS n_nodes
        |FROM best GROUP BY 1""".stripMargin,

    // same exact registers (hex-parse hash, binary-string bit length),
    // same bucket-ordered fold — the estimate matches to the bit
    "q_hll" ->
      """WITH h AS (SELECT
        |    CAST(('0x'||substr(md5(CAST(l_orderkey AS VARCHAR)),1,15))
        |         AS BIGINT) AS h FROM lineitem),
        |r AS (SELECT h // 1125899906842624 AS bucket,
        |        CASE WHEN h % 1125899906842624 = 0 THEN 51
        |             ELSE 51 - length(printf('%b', h % 1125899906842624))
        |        END AS rho
        |      FROM h),
        |regs AS (SELECT bucket, MAX(rho) AS mreg FROM r GROUP BY 1),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS occ,
        |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list_transform(list(mreg ORDER BY bucket),
        |            m -> 1.0 / CAST(1::BIGINT << m AS DOUBLE))),
        |          (x, y) -> x + y) AS z_occ
        |      FROM regs),
        |e AS (SELECT COUNT(DISTINCT h) AS n_exact FROM h)
        |SELECT CAST(1024 AS BIGINT) AS m,
        |  CAST(1024 - occ AS BIGINT) AS v_empty,
        |  (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 /
        |    (z_occ + CAST(1024 - occ AS DOUBLE)) AS estimate,
        |  n_exact
        |FROM f, e""".stripMargin,

    // Σs² is order-free exact arithmetic; the one division matches
    "q_herfindahl" ->
      """WITH sup AS (SELECT l_suppkey,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS c
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT s.s_nationkey AS nationkey, sup.c
        |      FROM sup JOIN supplier s ON sup.l_suppkey = s.s_suppkey)
        |SELECT nationkey, COUNT(*) AS n_suppliers,
        |  CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) /
        |  (CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) *
        |   CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)) AS hhi
        |FROM j GROUP BY 1""".stripMargin,

    // same p90 rank cut (ceil(0.9·n) over per-customer exact revenue),
    // same value-membership rule at the cut
    "q_pareto_share" ->
      """WITH cust AS (SELECT o_custkey,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev
        |  FROM orders GROUP BY 1),
        |r AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY rev) AS rn,
        |        COUNT(*) OVER () AS n FROM cust),
        |cut AS (SELECT MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
        |          THEN rev END) AS p90 FROM r)
        |SELECT COUNT(*) AS n_cust,
        |  CAST(SUM(CASE WHEN rev >= p90 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_top,
        |  CAST(CAST(SUM(CASE WHEN rev >= p90 THEN rev ELSE 0 END) AS BIGINT)
        |       AS DOUBLE) /
        |  CAST(CAST(SUM(rev) AS BIGINT) AS DOUBLE) AS top_share
        |FROM cust CROSS JOIN cut""".stripMargin,

    // exact 2U from the same collapsed cumulatives; identical z sequence
    "q_mwu" ->
      """WITH e AS (SELECT event_type,
        |             CAST(floor(value * 1e6) AS BIGINT) AS vq FROM events
        |           WHERE event_type IN ('view', 'click')),
        |c AS (SELECT vq,
        |        SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c1,
        |        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2
        |      FROM e GROUP BY 1),
        |cum AS (SELECT vq, c1, c2,
        |          SUM(c2) OVER (ORDER BY vq ROWS UNBOUNDED PRECEDING) AS a2
        |        FROM c),
        |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |             CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
        |u AS (SELECT SUM(c1 * (2 * (a2 - c2) + c2)) AS u2 FROM cum)
        |SELECT n1, n2, CAST(u2 AS DOUBLE) / 2.0 AS u1,
        |  (CAST(u2 AS DOUBLE) / 2.0 -
        |   CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) /
        |  sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) *
        |       (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0) / 12.0) AS z
        |FROM u, t""".stripMargin,

    // same cells and expected values as q_chi2; the chi2 total folds
    // contributions in the same (status, prio) order
    "q_cramer" ->
      """WITH cells AS (SELECT o_orderstatus AS status,
        |                 o_orderpriority AS prio, COUNT(*) AS obs
        |               FROM orders GROUP BY 1, 2),
        |r AS (SELECT status, SUM(obs) AS rt FROM cells GROUP BY 1),
        |c AS (SELECT prio, SUM(obs) AS ct FROM cells GROUP BY 1),
        |t AS (SELECT SUM(obs) AS total FROM cells),
        |e AS (SELECT status, prio, obs,
        |        CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / total AS expected
        |      FROM cells JOIN r USING (status) JOIN c USING (prio)
        |      CROSS JOIN t),
        |x AS (SELECT status, prio, obs,
        |        (obs - expected) * (obs - expected) / expected AS contrib
        |      FROM e),
        |f AS (SELECT COUNT(DISTINCT status) AS r, COUNT(DISTINCT prio) AS c,
        |        CAST(SUM(obs) AS BIGINT) AS n,
        |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list(contrib ORDER BY status, prio)), (a, b) -> a + b)
        |          AS chi2
        |      FROM x)
        |SELECT r, c, n, chi2,
        |  sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(least(r - 1, c - 1) AS DOUBLE)))
        |    AS cramer_v
        |FROM f""".stripMargin,

    // same collapsed two-counter cumulatives single-node; identical
    // IEEE divisions and the same total argmax order
    "q_ks" ->
      """WITH e AS (SELECT event_type,
        |             CAST(floor(value * 1e6) AS BIGINT) AS vq FROM events
        |           WHERE event_type IN ('view', 'click')),
        |c AS (SELECT vq,
        |        SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c1,
        |        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2
        |      FROM e GROUP BY 1),
        |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |             CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
        |cum AS (SELECT vq,
        |          SUM(c1) OVER (ORDER BY vq ROWS UNBOUNDED PRECEDING) AS a1,
        |          SUM(c2) OVER (ORDER BY vq ROWS UNBOUNDED PRECEDING) AS a2
        |        FROM c)
        |SELECT CAST(vq AS DOUBLE) / 1000000.0 AS at_value,
        |  abs(CAST(a1 AS DOUBLE) / n1 - CAST(a2 AS DOUBLE) / n2) AS ks_d,
        |  n1, n2
        |FROM cum, t ORDER BY ks_d DESC, vq ASC LIMIT 1""".stripMargin,

    // the streamed registers ARE the batch registers (bucket-max is
    // associative) — same fold, same estimate, over orders customers
    "stream_hll" ->
      """WITH h AS (SELECT
        |    CAST(('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,15))
        |         AS BIGINT) AS h FROM orders),
        |r AS (SELECT h // 1125899906842624 AS bucket,
        |        CASE WHEN h % 1125899906842624 = 0 THEN 51
        |             ELSE 51 - length(printf('%b', h % 1125899906842624))
        |        END AS rho
        |      FROM h),
        |regs AS (SELECT bucket, MAX(rho) AS mreg FROM r GROUP BY 1),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS occ,
        |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |          list_transform(list(mreg ORDER BY bucket),
        |            m -> 1.0 / CAST(1::BIGINT << m AS DOUBLE))),
        |          (x, y) -> x + y) AS z_occ
        |      FROM regs),
        |e AS (SELECT COUNT(DISTINCT h) AS n_exact FROM h)
        |SELECT CAST(1024 AS BIGINT) AS m,
        |  CAST(1024 - occ AS BIGINT) AS v_empty,
        |  (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 /
        |    (z_occ + CAST(1024 - occ AS DOUBLE)) AS estimate,
        |  n_exact
        |FROM f, e""".stripMargin,

    // same integer histogram, same crossing rule — brackets match
    // exactly because bucket counts are deterministic longs
    "q_quantile_hist" ->
      """WITH h AS (SELECT event_type,
        |             CAST(floor(value / 25.0) AS BIGINT) AS bucket,
        |             COUNT(*) AS cnt FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, bucket, cnt,
        |        SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
        |                       ROWS UNBOUNDED PRECEDING) AS cum,
        |        SUM(cnt) OVER (PARTITION BY event_type) AS n FROM h),
        |p AS (SELECT unnest([0.5, 0.95, 0.99]) AS q),
        |x AS (SELECT c.event_type, p.q, c.bucket, c.n,
        |        ROW_NUMBER() OVER (PARTITION BY c.event_type, p.q
        |                           ORDER BY c.bucket) AS rk
        |      FROM c JOIN p ON c.cum >= ceil(p.q * c.n))
        |SELECT event_type, q, bucket * 25.0 AS est_lo,
        |       (bucket + 1) * 25.0 AS est_hi, CAST(n AS BIGINT) AS n
        |FROM x WHERE rk = 1""".stripMargin,

    // four exact cells from one conditional scan; delta_treat/delta_ctrl
    // compute once and did composes the same op sequence
    "q_did" ->
      """WITH e AS (SELECT event_type AS g,
        |             epoch_ns(ts) // 86400000000000 >= 19738 AS post,
        |             CAST(floor(value * 1e6) AS BIGINT) AS vq
        |           FROM events WHERE event_type IN ('view', 'click')),
        |c AS (SELECT
        |  CAST(SUM(CASE WHEN g = 'click' AND NOT post THEN vq END) AS BIGINT) AS s_t0,
        |  COUNT(CASE WHEN g = 'click' AND NOT post THEN 1 END) AS n_t0,
        |  CAST(SUM(CASE WHEN g = 'click' AND post THEN vq END) AS BIGINT) AS s_t1,
        |  COUNT(CASE WHEN g = 'click' AND post THEN 1 END) AS n_t1,
        |  CAST(SUM(CASE WHEN g = 'view' AND NOT post THEN vq END) AS BIGINT) AS s_c0,
        |  COUNT(CASE WHEN g = 'view' AND NOT post THEN 1 END) AS n_c0,
        |  CAST(SUM(CASE WHEN g = 'view' AND post THEN vq END) AS BIGINT) AS s_c1,
        |  COUNT(CASE WHEN g = 'view' AND post THEN 1 END) AS n_c1
        |  FROM e)
        |SELECT n_t0, n_t1, n_c0, n_c1,
        |  (CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0) / 1000000.0 AS delta_treat,
        |  (CAST(s_c1 AS DOUBLE) / n_c1 - CAST(s_c0 AS DOUBLE) / n_c0) / 1000000.0 AS delta_ctrl,
        |  ((CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0) -
        |   (CAST(s_c1 AS DOUBLE) / n_c1 - CAST(s_c0 AS DOUBLE) / n_c0)) / 1000000.0 AS did
        |FROM c""".stripMargin,

    // single-node exact p05/p95 ranks pick the same cut integers; the
    // clamp and both means are the identical op sequence
    "q_winsorize" ->
      """WITH e AS (SELECT event_type,
        |             CAST(floor(value * 1e6) AS BIGINT) AS vq FROM events),
        |r AS (SELECT event_type, vq,
        |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vq) AS rn,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n FROM e),
        |lo AS (SELECT event_type,
        |         MAX(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
        |             THEN vq END) AS p05 FROM r GROUP BY 1),
        |hi AS (SELECT event_type,
        |         MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
        |             THEN vq END) AS p95 FROM r GROUP BY 1),
        |w AS (SELECT e.event_type, e.vq,
        |        greatest(lo.p05, least(e.vq, hi.p95)) AS wq
        |      FROM e JOIN lo USING (event_type) JOIN hi USING (event_type))
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(CAST(SUM(vq) AS BIGINT) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_raw,
        |  CAST(CAST(SUM(wq) AS BIGINT) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_winsor
        |FROM w GROUP BY 1""".stripMargin,

    // same daily totals, same 7-day lag pairing, same exact error sums
    "q_backtest" ->
      """WITH daily AS (SELECT event_type,
        |                 epoch_ns(ts) // 86400000000000 AS idx,
        |                 SUM(CAST(floor(value * 1e6) AS BIGINT)) AS x
        |               FROM events GROUP BY 1, 2),
        |j AS (SELECT d.event_type, d.x, f.x AS pred
        |      FROM daily d JOIN daily f
        |        ON f.event_type = d.event_type AND f.idx + 7 = d.idx),
        |s AS (SELECT event_type, COUNT(*) AS n_days,
        |        CAST(SUM(abs(x - pred)) AS BIGINT) AS sae,
        |        CAST(SUM(abs(x)) AS BIGINT) AS sax
        |      FROM j GROUP BY 1)
        |SELECT event_type, n_days,
        |  CAST(sae AS DOUBLE) / n_days / 1000000.0 AS mae,
        |  CAST(sae AS DOUBLE) / CAST(sax AS DOUBLE) AS wape
        |FROM s""".stripMargin,

    // the oracle takes the O(n²) declarative dominance form over the
    // same exact-cents distinct pairs — same frontier, different plan
    "q_skyline" ->
      """WITH pr AS (SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS pc,
        |              CAST(p_size AS BIGINT) AS sz FROM part),
        |pairs AS (SELECT pc, sz, COUNT(*) AS n_parts FROM pr GROUP BY 1, 2)
        |SELECT p.pc AS price_c, p.sz AS size, p.n_parts
        |FROM pairs p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pairs q
        |  WHERE q.pc <= p.pc AND q.sz >= p.sz
        |    AND (q.pc < p.pc OR q.sz > p.sz))""".stripMargin,

    // single-node cumulative weights over the same (group, value) order;
    // equal-value rows may cross in any order — the output value is the
    // same; only the /100 re-scale is IEEE
    "q_wmedian" ->
      """WITH l AS (SELECT l_returnflag AS g,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |             CAST(round(l_quantity) AS BIGINT) AS w FROM lineitem),
        |o AS (SELECT g, v, w,
        |        SUM(w) OVER (PARTITION BY g ORDER BY v
        |                     ROWS UNBOUNDED PRECEDING) AS cw,
        |        SUM(w) OVER (PARTITION BY g) AS tw FROM l)
        |SELECT g AS l_returnflag, CAST(v AS DOUBLE) / 100.0 AS wmedian,
        |       CAST(tw AS BIGINT) AS total_w
        |FROM o
        |WHERE cw >= (tw + 1) // 2 AND cw - w < (tw + 1) // 2""".stripMargin,

    // same daily totals, same 7-day membership, same fixed IEEE band
    // sequence over exact sums
    "q_bollinger" ->
      """WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS idx,
        |                 SUM(CAST(floor(value * 1e6) AS BIGINT)) AS x
        |               FROM events GROUP BY 1),
        |mem AS (SELECT d.idx + o.off AS tgt, d.x FROM daily d
        |        CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS off) o),
        |w AS (SELECT m.tgt, COUNT(*) AS m, SUM(m.x) AS sx,
        |        SUM(CAST(m.x AS HUGEINT) * m.x) AS sxx
        |      FROM mem m JOIN daily t ON t.idx = m.tgt GROUP BY 1),
        |v2 AS (SELECT tgt, m, sx, m * sxx - CAST(sx AS HUGEINT) * sx AS vnum
        |      FROM w WHERE m = 7)
        |SELECT tgt AS day_idx,
        |  ROUND(CAST(sx AS DOUBLE) / m / 1000000.0, 4) AS mean,
        |  ROUND((CAST(sx AS DOUBLE) / m + 2.0 *
        |   sqrt(CAST(vnum AS DOUBLE) / m / (m - 1))) / 1000000.0, 4) AS upper,
        |  ROUND((CAST(sx AS DOUBLE) / m - 2.0 *
        |   sqrt(CAST(vnum AS DOUBLE) / m / (m - 1))) / 1000000.0, 4) AS lower
        |FROM v2""".stripMargin,

    // same strict-past IGNORE-NULLS window under the same total order;
    // exact-cents revenue with the one trailing IEEE division
    "q_attribution" ->
      """WITH t AS (SELECT user_id, event_type, value,
        |  last_value(CASE WHEN event_type != 'purchase' THEN event_type END
        |             IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, 'direct') AS channel,
        |       COUNT(*) AS n_purchases,
        |       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS revenue
        |FROM t WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,

    // the streamed per-purchase credits ARE the batch window's — same
    // oracle as q_attribution
    "stream_attribution" ->
      """WITH t AS (SELECT user_id, event_type, value,
        |  last_value(CASE WHEN event_type != 'purchase' THEN event_type END
        |             IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, 'direct') AS channel,
        |       COUNT(*) AS n_purchases,
        |       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS revenue
        |FROM t WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,

    // the streamed daily totals ARE the batch totals — same oracle shape
    // as q_bollinger
    "stream_bollinger" ->
      """WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS idx,
        |                 SUM(CAST(floor(value * 1e6) AS BIGINT)) AS x
        |               FROM events GROUP BY 1),
        |mem AS (SELECT d.idx + o.off AS tgt, d.x FROM daily d
        |        CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS off) o),
        |w AS (SELECT m.tgt, COUNT(*) AS m, SUM(m.x) AS sx,
        |        SUM(CAST(m.x AS HUGEINT) * m.x) AS sxx
        |      FROM mem m JOIN daily t ON t.idx = m.tgt GROUP BY 1),
        |v2 AS (SELECT tgt, m, sx, m * sxx - CAST(sx AS HUGEINT) * sx AS vnum
        |      FROM w WHERE m = 7)
        |SELECT tgt AS day_idx,
        |  ROUND(CAST(sx AS DOUBLE) / m / 1000000.0, 4) AS mean,
        |  ROUND((CAST(sx AS DOUBLE) / m + 2.0 *
        |   sqrt(CAST(vnum AS DOUBLE) / m / (m - 1))) / 1000000.0, 4) AS upper,
        |  ROUND((CAST(sx AS DOUBLE) / m - 2.0 *
        |   sqrt(CAST(vnum AS DOUBLE) / m / (m - 1))) / 1000000.0, 4) AS lower
        |FROM v2""".stripMargin,

    // the streamed moment sums ARE the batch sums — the oracle regresses
    // the same day-index/micro-quantized series
    "stream_linreg" ->
      """WITH m AS (SELECT event_type,
        |             epoch_ns(ts) // 86400000000000 AS x,
        |             CAST(floor(value * 1e6) AS BIGINT) AS y FROM events),
        |s AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
        |      FROM m GROUP BY 1),
        |t AS (SELECT event_type, n,
        |        (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) /
        |        (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) AS slope_q,
        |        sx, sy, sxx, syy, sxy FROM s)
        |SELECT event_type, n, slope_q / 1000000.0 AS slope,
        |  (CAST(sy AS DOUBLE) / n - slope_q * (CAST(sx AS DOUBLE) / n)) / 1000000.0 AS intercept,
        |  ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) *
        |   (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)) /
        |  ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) *
        |   (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)) AS r2
        |FROM t""".stripMargin,

    // the streamed moment sums must score identically — same oracle as
    // q_zscore
    "stream_zscore" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |             CAST(floor(value * 1e6) AS BIGINT) AS vq FROM events),
        |s AS (SELECT event_type, COUNT(*) AS n, SUM(vq) AS sv,
        |        SUM(vq * vq) AS svv FROM e GROUP BY 1),
        |st AS (SELECT event_type, CAST(sv AS DOUBLE) / n AS mean_q,
        |         sqrt((CAST(svv AS DOUBLE)
        |           - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n) / (n - 1))
        |           AS std_q
        |       FROM s WHERE n > 1)
        |SELECT e.event_id, e.event_type, e.value,
        |       (CAST(e.vq AS DOUBLE) - st.mean_q) / st.std_q AS z
        |FROM e JOIN st ON e.event_type = st.event_type
        |WHERE st.std_q > 0
        |  AND abs((CAST(e.vq AS DOUBLE) - st.mean_q) / st.std_q) > 3.0
        |ORDER BY abs((CAST(e.vq AS DOUBLE) - st.mean_q) / st.std_q) DESC,
        |         e.event_id ASC
        |LIMIT 20""".stripMargin,

    // first-active-day cohorts x integer day offsets; the (user, day)
    // active set is distinct before the join so COUNT(*) is users
    "q_cohort" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |             epoch_ns(ts) - epoch_ns(ts) % 86400000000000 AS day_ns
        |           FROM events),
        |c AS (SELECT user_id, MIN(day_ns) AS cohort_ns FROM a GROUP BY 1)
        |SELECT c.cohort_ns,
        |  (a.day_ns - c.cohort_ns) // 86400000000000 AS offset_days,
        |  COUNT(*) AS n_users
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,

    // single-node ranks replay the distributed cut machinery exactly
    // (same (v, custkey) total order, same ceil(q·n) targets); segment
    // assignment is the same value comparisons, so boundary ties land
    // identically
    "q_rfm" ->
      """WITH cust AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(datediff('day', CAST(MAX(o_orderdate) AS DATE),
        |         DATE '1999-01-01') AS BIGINT) AS rec,
        |    COUNT(*) AS freq,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |      AS mon
        |  FROM orders GROUP BY 1),
        |rr AS (SELECT rec AS v, row_number() OVER (ORDER BY rec, custkey)
        |         AS rn, COUNT(*) OVER () AS n FROM cust),
        |rc AS (SELECT
        |  MAX(CASE WHEN rn = CAST(ceil(0.2*n) AS BIGINT) THEN v END) AS r20,
        |  MAX(CASE WHEN rn = CAST(ceil(0.4*n) AS BIGINT) THEN v END) AS r40,
        |  MAX(CASE WHEN rn = CAST(ceil(0.6*n) AS BIGINT) THEN v END) AS r60,
        |  MAX(CASE WHEN rn = CAST(ceil(0.8*n) AS BIGINT) THEN v END) AS r80
        |  FROM rr),
        |fr AS (SELECT freq AS v, row_number() OVER (ORDER BY freq, custkey)
        |         AS rn, COUNT(*) OVER () AS n FROM cust),
        |fc AS (SELECT
        |  MAX(CASE WHEN rn = CAST(ceil(0.2*n) AS BIGINT) THEN v END) AS f20,
        |  MAX(CASE WHEN rn = CAST(ceil(0.4*n) AS BIGINT) THEN v END) AS f40,
        |  MAX(CASE WHEN rn = CAST(ceil(0.6*n) AS BIGINT) THEN v END) AS f60,
        |  MAX(CASE WHEN rn = CAST(ceil(0.8*n) AS BIGINT) THEN v END) AS f80
        |  FROM fr),
        |mr AS (SELECT mon AS v, row_number() OVER (ORDER BY mon, custkey)
        |         AS rn, COUNT(*) OVER () AS n FROM cust),
        |mc AS (SELECT
        |  MAX(CASE WHEN rn = CAST(ceil(0.2*n) AS BIGINT) THEN v END) AS m20,
        |  MAX(CASE WHEN rn = CAST(ceil(0.4*n) AS BIGINT) THEN v END) AS m40,
        |  MAX(CASE WHEN rn = CAST(ceil(0.6*n) AS BIGINT) THEN v END) AS m60,
        |  MAX(CASE WHEN rn = CAST(ceil(0.8*n) AS BIGINT) THEN v END) AS m80
        |  FROM mr),
        |seg AS (SELECT
        |  1 + CAST(rec > r20 AS BIGINT) + CAST(rec > r40 AS BIGINT)
        |    + CAST(rec > r60 AS BIGINT) + CAST(rec > r80 AS BIGINT) AS r_seg,
        |  1 + CAST(freq > f20 AS BIGINT) + CAST(freq > f40 AS BIGINT)
        |    + CAST(freq > f60 AS BIGINT) + CAST(freq > f80 AS BIGINT) AS f_seg,
        |  1 + CAST(mon > m20 AS BIGINT) + CAST(mon > m40 AS BIGINT)
        |    + CAST(mon > m60 AS BIGINT) + CAST(mon > m80 AS BIGINT) AS m_seg,
        |  mon
        |  FROM cust, rc, fc, mc)
        |SELECT r_seg, f_seg, m_seg, COUNT(*) AS n_cust,
        |       CAST(SUM(mon) AS DOUBLE) / 100.0 AS monetary
        |FROM seg GROUP BY 1, 2, 3""".stripMargin,

    // open/close replay by day-partitioned row_number (the oracle is
    // single-node, so the window the engine avoids is fine HERE); the
    // (tns, event_id) composite order mirrors the engine's struct key
    "q_ohlc" ->
      """WITH e AS (SELECT epoch_ns(ts) AS tns, event_id, value,
        |             epoch_ns(ts) - epoch_ns(ts) % 86400000000000 AS day_ns
        |           FROM events),
        |r AS (SELECT day_ns, value,
        |        row_number() OVER (PARTITION BY day_ns
        |          ORDER BY tns ASC, event_id ASC) AS ra,
        |        row_number() OVER (PARTITION BY day_ns
        |          ORDER BY tns DESC, event_id DESC) AS rd
        |      FROM e)
        |SELECT day_ns,
        |  MAX(CASE WHEN ra = 1 THEN value END) AS open,
        |  MAX(value) AS high, MIN(value) AS low,
        |  MAX(CASE WHEN rd = 1 THEN value END) AS close,
        |  COUNT(*) AS n
        |FROM r GROUP BY 1""".stripMargin,

    // the melt replayed as UNION ALL (portable UNPIVOT); exact decimal
    // sums cast to double per the q1_agg convention
    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price,
        |    CAST(COUNT(*) AS DOUBLE) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT flag, 'qty' AS measure, qty AS value FROM wide
        |UNION ALL SELECT flag, 'price' AS measure, price AS value FROM wide
        |UNION ALL SELECT flag, 'cnt' AS measure, cnt AS value FROM wide""".stripMargin,

    // identical value-based frame; decimal window sum cast to double =
    // the engine's cents-long sum / 100.0
    "q_window_range" ->
      """WITH o AS (SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |             date_diff('day', DATE '1970-01-01',
        |                       CAST(o_orderdate AS DATE)) AS day,
        |             CAST(o_totalprice AS DECIMAL(12,2)) AS p
        |           FROM orders WHERE o_custkey < 150)
        |SELECT custkey, orderkey,
        |  CAST(SUM(p) OVER win AS DOUBLE) AS win_sum,
        |  COUNT(*) OVER win AS win_n
        |FROM o
        |WINDOW win AS (PARTITION BY custkey ORDER BY day
        |               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""".stripMargin,

    // binary-weight EWMA replayed with the same integer shifts (// is
    // truncate-toward-zero like Spark's div; all terms non-negative)
    // the same exact-integer CUSUM: every quantity BIGINT, the argmax
    // tie-broken to the earliest position — bit-identical by
    // construction, no IEEE anywhere
    "q_changepoint" ->
      """WITH e AS (SELECT event_type, ts, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS vc
        |           FROM events),
        |s AS (SELECT event_type,
        |        SUM(vc) OVER (PARTITION BY event_type
        |          ORDER BY ts ASC, event_id ASC
        |          ROWS UNBOUNDED PRECEDING) AS cum,
        |        CAST(row_number() OVER (PARTITION BY event_type
        |          ORDER BY ts ASC, event_id ASC) AS BIGINT) AS cp_pos,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n,
        |        SUM(vc) OVER (PARTITION BY event_type) AS total
        |      FROM e)
        |SELECT event_type, cp_pos, score FROM (
        |  SELECT event_type, cp_pos,
        |    CAST(abs(n * cum - cp_pos * total) AS BIGINT) AS score,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(n * cum - cp_pos * total) DESC, cp_pos ASC) AS r
        |  FROM s) WHERE r = 1""".stripMargin,

    // identical algebra — the streamed statistic must land
    // bit-identical to the batch whole-partition aggregates
    "stream_changepoint" ->
      """WITH e AS (SELECT event_type, ts, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS vc
        |           FROM events),
        |s AS (SELECT event_type,
        |        SUM(vc) OVER (PARTITION BY event_type
        |          ORDER BY ts ASC, event_id ASC
        |          ROWS UNBOUNDED PRECEDING) AS cum,
        |        CAST(row_number() OVER (PARTITION BY event_type
        |          ORDER BY ts ASC, event_id ASC) AS BIGINT) AS cp_pos,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n,
        |        SUM(vc) OVER (PARTITION BY event_type) AS total
        |      FROM e)
        |SELECT event_type, cp_pos, score FROM (
        |  SELECT event_type, cp_pos,
        |    CAST(abs(n * cum - cp_pos * total) AS BIGINT) AS score,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(n * cum - cp_pos * total) DESC, cp_pos ASC) AS r
        |  FROM s) WHERE r = 1""".stripMargin,

    "q_ema" ->
      """WITH e AS (SELECT user_id, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS vc,
        |             COALESCE(lag(CAST(round(value * 100) AS BIGINT), 1) OVER win, 0) AS l1,
        |             COALESCE(lag(CAST(round(value * 100) AS BIGINT), 2) OVER win, 0) AS l2,
        |             COALESCE(lag(CAST(round(value * 100) AS BIGINT), 3) OVER win, 0) AS l3
        |           FROM events
        |           WINDOW win AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |SELECT user_id, event_id,
        |  vc + (l1 // 2) + (l2 // 4) + (l3 // 8) AS ema_q
        |FROM e""".stripMargin,

    // same pair/item/total counts; every statistic the same textual
    // IEEE sequence over exact integers; (lift desc, p1, p2) is total
    "q_assoc_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |i AS (SELECT l_partkey, COUNT(*) AS cnt FROM li GROUP BY 1),
        |t AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
        |p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS joint
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |                         AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2)
        |SELECT p1, p2, joint, i1.cnt AS n1, i2.cnt AS n2,
        |  CAST(joint AS DOUBLE) / CAST(n_orders AS DOUBLE) AS support,
        |  CAST(joint AS DOUBLE) / CAST(i1.cnt AS DOUBLE) AS conf12,
        |  CAST(joint AS DOUBLE) * CAST(n_orders AS DOUBLE)
        |    / (CAST(i1.cnt AS DOUBLE) * CAST(i2.cnt AS DOUBLE)) AS lift
        |FROM p
        |JOIN i i1 ON p.p1 = i1.l_partkey
        |JOIN i i2 ON p.p2 = i2.l_partkey
        |CROSS JOIN t
        |WHERE joint >= 3
        |ORDER BY lift DESC, p1 ASC, p2 ASC LIMIT 20""".stripMargin,

    // the same canonical pair join; LIMIT is safe because the order is
    // total (joint desc, p1, p2)
    "q_copurchase" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS joint
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |                         AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2)
        |SELECT p1, p2, joint FROM p
        |ORDER BY joint DESC, p1 ASC, p2 ASC LIMIT 20""".stripMargin,

    // single-node ranks replay the distributed rank machinery exactly:
    // equal-value rank permutations cannot move Σ rank·v, and the
    // final statistic is the same textual IEEE op sequence
    "q_gini" ->
      """WITH o AS (SELECT o_orderstatus AS status, o_orderkey,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders),
        |r AS (SELECT status, cents,
        |        row_number() OVER (PARTITION BY status
        |          ORDER BY cents, o_orderkey) AS rn
        |      FROM o),
        |g AS (SELECT status,
        |        SUM(CAST(cents * rn AS DECIMAL(38,0))) AS a,
        |        SUM(CAST(cents AS DECIMAL(38,0))) AS b,
        |        COUNT(*) AS n
        |      FROM r GROUP BY 1)
        |SELECT status, n,
        |  (2.0 * CAST(a AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(b AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(b AS DOUBLE)) AS gini
        |FROM g""".stripMargin,

    // long→text is engine-identical; the double share is one division
    // of two exact longs
    "q_benford" ->
      """WITH c AS (SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |                         AS VARCHAR), 1, 1) AS digit,
        |             COUNT(*) AS n
        |           FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
        |SELECT digit, n, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
        |FROM c, t""".stripMargin,

    // the same total tie order spelled as a rank: count desc, prio asc
    "q_mode" ->
      """WITH c AS (SELECT o_orderstatus AS status, o_orderpriority AS prio,
        |             COUNT(*) AS cnt
        |           FROM orders GROUP BY 1, 2),
        |r AS (SELECT status, prio, cnt,
        |        row_number() OVER (PARTITION BY status
        |          ORDER BY cnt DESC, prio ASC) AS rn
        |      FROM c)
        |SELECT status, prio AS mode_prio, cnt AS n FROM r WHERE rn = 1""".stripMargin,

    // 3 pagerank rounds unrolled; integer shares (// ≡ div on the
    // all-positive ranks) make the replay exact at any partitioning
    "q_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_suppkey * 2 AS a, o_custkey * 2 + 1 AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT a AS src, b AS dst FROM pairs
        |          UNION ALL SELECT b AS src, a AS dst FROM pairs),
        |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank_q FROM nodes),
        |c1 AS (SELECT e.dst AS node, CAST(SUM(r.rank_q // o.outdeg) AS BIGINT) AS recv_q
        |       FROM edges e JOIN outdeg o ON o.src = e.src
        |       JOIN r0 r ON r.node = e.src GROUP BY 1),
        |r1 AS (SELECT n.node,
        |         CAST(150000000 AS BIGINT) + (85 * COALESCE(c.recv_q, 0)) // 100 AS rank_q
        |       FROM nodes n LEFT JOIN c1 c ON c.node = n.node),
        |c2 AS (SELECT e.dst AS node, CAST(SUM(r.rank_q // o.outdeg) AS BIGINT) AS recv_q
        |       FROM edges e JOIN outdeg o ON o.src = e.src
        |       JOIN r1 r ON r.node = e.src GROUP BY 1),
        |r2 AS (SELECT n.node,
        |         CAST(150000000 AS BIGINT) + (85 * COALESCE(c.recv_q, 0)) // 100 AS rank_q
        |       FROM nodes n LEFT JOIN c2 c ON c.node = n.node),
        |c3 AS (SELECT e.dst AS node, CAST(SUM(r.rank_q // o.outdeg) AS BIGINT) AS recv_q
        |       FROM edges e JOIN outdeg o ON o.src = e.src
        |       JOIN r2 r ON r.node = e.src GROUP BY 1),
        |r3 AS (SELECT n.node,
        |         CAST(150000000 AS BIGINT) + (85 * COALESCE(c.recv_q, 0)) // 100 AS rank_q
        |       FROM nodes n LEFT JOIN c3 c ON c.node = n.node)
        |SELECT node, rank_q FROM r3""".stripMargin
  )
}
