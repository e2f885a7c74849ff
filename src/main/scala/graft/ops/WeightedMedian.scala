package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * EXACT weighted median per group in ONE full pass over the fact — the
 * scale form of the rank machinery for domains that do NOT collapse.
 *
 * The rankValue family (OlapQueries.withBucket/rankValues) collapses
 * equal values first, so its range exchange moves |distinct values|
 * rows — the right design when the domain collapses (q_mad's deviation
 * cents, q_percentile's prices-within-status). A weighted median over
 * near-unique values (q_wmedian's price domain) gets no collapse: the
 * r10 form still range-exchanged ~|fact| rows (measured 20.2s at the
 * 1000× fixture). This operator removes the fact-scale exchange
 * entirely — the 100 TB shape is one columnar scan + a |groups|-sized
 * shuffle, no network movement of fact rows:
 *
 *  1. BRACKET ESTIMATE (cheap): a per-(group, bucket) weight histogram
 *     of a caller-supplied SAMPLE frame (block-sample a few parquet
 *     files — row-sampling would scan everything) locates the value
 *     bucket span covering the [50−margin, 50+margin]% weight
 *     quantiles. The margin makes sample error irrelevant: the bracket
 *     must only CONTAIN the true median, not pin it.
 *  2. EXACT PASS (the one full scan): each row's value clamps to
 *     Long.MinValue below the bracket / Long.MaxValue above it, then a
 *     map-combined collapse of (group, clamped value) — in-bracket
 *     values stay distinct (≤ bracket-width cents per group), all
 *     out-of-bracket weight folds into the two sentinel rows, so the
 *     aggregate output is tiny at ANY fact size. A per-group running
 *     weight over that tiny table finds the unique row whose
 *     cumulative interval (cw−w, cw] contains t = ⌈W/2⌉; the BELOW
 *     sentinel sorts first, so its weight IS the bracket offset — no
 *     separate offset arithmetic.
 *  3. VERIFY + RETRY (loud, ~never taken): if the crossing row IS a
 *     sentinel, the sample's bracket missed the true median for that
 *     group — recompute exactly those groups with a full-range
 *     collapse (a second scan restricted by a tiny isin). The result
 *     is therefore exact for ANY sample, including an adversarial one;
 *     the sample quality only decides whether the retry scan runs.
 *
 * Determinism: all thresholds are integer arithmetic over exact long
 * weights; the caller owns sample determinism (a sorted-file-list
 * block sample is a pure function of the corpus). Contract: columns
 * (g: any, v: long ≥ 0 and < Long.MaxValue, w: long > 0) on both
 * frames. Returns (g, v, tw) — the weighted-median value and total
 * weight per group.
 */
object WeightedMedian {

  private val Below = Long.MinValue
  private val Above = Long.MaxValue

  def perGroup(full: DataFrame, sample: DataFrame,
               bucketWidth: Long = 4096L, marginPct: Int = 10): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth must be >= 1")
    require(marginPct >= 1 && marginPct <= 49,
      s"marginPct=$marginPct must be in [1, 49]")

    // 1. bracket span per group off the sample's bucket histogram: the
    // first bucket whose cumulative weight reaches the (50−m)% /
    // (50+m)% thresholds (ceil on the high side; a group whose sample
    // never reaches it — all weight below — takes its max bucket)
    val wCum = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
    val hist = sample
      .groupBy(col("g"), expr(s"v div $bucketWidth").as("b"))
      .agg(sum(col("w")).as("bw"))
      .withColumn("cum", sum(col("bw")).over(wCum))
      .withColumn("stw", sum(col("bw")).over(wAll))
    val brackets = hist
      .groupBy(col("g"))
      .agg(
        min(when(col("cum") >= expr(s"((50 - $marginPct) * stw) div 100"),
          col("b"))).as("lob"),
        coalesce(
          min(when(col("cum") >= expr(s"((50 + $marginPct) * stw + 99) div 100"),
            col("b"))),
          max(col("b"))).as("hib"))
      .select(col("g").as("bg"),
        (col("lob") * bucketWidth).as("lo"),
        ((col("hib") + 1) * bucketWidth).as("hi"))

    // 2. the ONE full scan: clamp, collapse map-combined, tiny window.
    // The clamp compares against GLOBAL LITERAL bounds [min lo, max hi)
    // — two long comparisons inside whole-stage codegen. The first cut
    // broadcast-joined the per-group bounds in; the 3-entry hash probe
    // + per-row string key tripled the scan (measured 5.4s vs 1.6s at
    // the 100× fixture, 60M rows), and value-only clamping is EQUALLY
    // exact: it is a coarser but still order-preserving collapse per
    // group (values between two groups' brackets stay distinct rather
    // than folding into a sentinel — extra collapsed rows, never a
    // wrong crossing), and group g's crossing lands on a sentinel iff
    // its true median escapes the GLOBAL bounds — a strictly rarer
    // retry than the per-group condition. The cost model
    // flips only when group brackets are WILDLY disjoint (the global
    // span covers every value between them), so a spread guard falls
    // back to the per-group broadcast join: exact either way, the
    // guard only picks the cheaper scan.
    val bStats = brackets
      .agg(min(col("lo")), max(col("hi")), max(col("hi") - col("lo")))
      .collect()(0)
    val clamped =
      if (bStats.isNullAt(0)) // empty sample: no brackets, no clamp
        full.select(col("g"), col("v").as("cv"), col("w"))
      else if (bStats.getLong(1) - bStats.getLong(0) <=
               16L * bStats.getLong(2))
        full.select(col("g"),
          when(col("v") < lit(bStats.getLong(0)), lit(Below))
            .when(col("v") >= lit(bStats.getLong(1)), lit(Above))
            .otherwise(col("v")).as("cv"),
          col("w"))
      else
        // groups live on disjoint value ranges: per-group bounds.
        // LEFT join: a group absent from the sample gets null bounds,
        // both `when` conditions evaluate null (= not matched) and its
        // values pass through unclamped — exact with no bracket.
        full.join(broadcast(brackets), col("g") === col("bg"), "left")
          .select(col("g"),
            when(col("v") < col("lo"), lit(Below))
              .when(col("v") >= col("hi"), lit(Above))
              .otherwise(col("v")).as("cv"),
            col("w"))
    // ≤ |groups| rows materialize — the driver miss-check below and the
    // returned frame both read this checkpoint, so the heavy pass runs
    // exactly once
    val crossing = crossOf(clamped).localCheckpoint()

    // 3. a sentinel crossing = the bracket missed the true median
    val missed = crossing
      .where(col("cv") === Below || col("cv") === Above)
      .select(col("g")).collect().map(_.get(0))
    val hit = crossing
      .where(col("cv") =!= Below && col("cv") =!= Above)
      .select(col("g"), col("cv").as("v"), col("tw"))
    if (missed.isEmpty) hit
    else {
      // loud: a production run wants to know its sample went stale
      System.err.println(s"[graft] WeightedMedian: bracket missed for " +
        s"${missed.length} group(s) (${missed.take(5).mkString(", ")}) — " +
        "full-range retry scan")
      hit.unionByName(
        crossOf(full.where(col("g").isin(missed.toSeq: _*))
            .select(col("g"), col("v").as("cv"), col("w")))
          .select(col("g"), col("cv").as("v"), col("tw")))
    }
  }

  /** The crossing row per group: collapse (g, cv) map-combined, run the
    * per-group cumulative weight over the collapsed rows, keep the
    * unique row whose interval (cum−w, cum] contains t = ⌈W/2⌉. */
  private def crossOf(rows: DataFrame): DataFrame = {
    val wIn = Window.partitionBy(col("g")).orderBy(col("cv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.groupBy(col("g"), col("cv")).agg(sum(col("w")).as("cw0"))
      .withColumn("cum", sum(col("cw0")).over(wIn))
      .withColumn("tw", sum(col("cw0")).over(
        Window.partitionBy(col("g"))))
      .withColumn("t", expr("(tw + 1) div 2"))
      .where(col("cum") >= col("t") && col("cum") - col("cw0") < col("t"))
  }
}
