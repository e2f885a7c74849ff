package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics over an edge list — the entity-importance
 * step of a data-curation pipeline (rank sources/authors/hosts by link
 * structure, weight documents by their provenance's rank). PageRank in
 * the "mean 1" formulation: every node starts at rank 1, each round a
 * node keeps 0.15 and receives 0.85 × the sum of its in-neighbors'
 * rank/outdegree shares. A fixed round count (the caller picks it; the
 * web-graph literature uses a few dozen, tests use 3) rather than a
 * convergence probe: rank deltas shrink geometrically, and a
 * deterministic round count keeps the result oracle-replayable.
 *
 * Determinism (SURVEY §4): ranks are scaled longs (1.0 ≡ `scaleQ` =
 * 1e9), every update is integer arithmetic — `rank div outdeg` shares,
 * `(85 × Σshares) div 100` damping — so the distributed sum is
 * associative and the result hash-matches a single-node replay exactly,
 * with zero float drift across any partitioning. Headroom: Σ rank mass
 * = N×1e9 and the ×85 step needs 100× slack, so the quantum holds to
 * ~10^8 nodes; a 100 TB graph drops scaleQ a decade per ×10 nodes
 * (the caller owns the trade — documented, not silent).
 *
 * Scale shape: each round is TWO key shuffles — edges ⋈ ranks on src
 * (contribution send) and a groupBy(dst) sum (receive, map-side
 * combinable) — then a left join back to the static node set for
 * dangling nodes. The edge list and its outdegrees are computed ONCE
 * and localCheckpoint'd; per-round state is |V| rows (node, rank), never
 * |E|. Rounds localCheckpoint + free their predecessor exactly like
 * [[Components]] — the fixpoint-graph idiom that keeps the plan flat
 * and the block store bounded.
 */
object Graph {

  val scaleQ: Long = 1000000000L // rank 1.0 as a scaled long

  /** edges: columns (src, dst), directed, multi-edges allowed (they
    * weight the share like parallel links). Returns (node, rank_q) for
    * every node appearing as src or dst; rank_q = PageRank × scaleQ
    * after exactly `iters` synchronous rounds, damping 0.85. */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"pagerank: iters=$iters must be >= 1")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    // the initial rank is checkpointed too: freeCheckpoint walks the
    // plan's LogicalRDDs, so a NON-checkpointed initial rank would hand
    // the shared `nodes` checkpoint to round 1's free
    var rank = nodes.withColumn("rank_q", lit(scaleQ)).localCheckpoint()
    for (_ <- 1 to iters) {
      // send: each edge carries src_rank div outdeg to its dst. The join
      // keys both big sides on src (one shuffle); the groupBy(dst) sum is
      // the second, map-side combined.
      val recv = e
        .join(outdeg, "src")
        .join(rank.select(col("node").as("src"), col("rank_q")), "src")
        .select(col("dst").as("node"),
          expr("rank_q div outdeg").as("share"))
        .groupBy(col("node")).agg(sum(col("share")).as("recv_q"))
      val next = nodes
        .join(recv, Seq("node"), "left")
        .select(col("node"),
          (lit(15L * scaleQ / 100) +
            expr(s"(85 * coalesce(recv_q, 0L)) div 100")).as("rank_q"))
        .localCheckpoint()
      freeCheckpoint(rank)
      rank = next
    }
    freeCheckpoint(e); freeCheckpoint(outdeg); freeCheckpoint(nodes)
    rank
  }

  /** Release a superseded localCheckpoint's blocks now (see
    * [[Components.freeCheckpoint]] for why unpersist alone is not it). */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
