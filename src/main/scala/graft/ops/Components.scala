package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over an undirected pair list — the cluster-forming
 * step of a dedup pipeline (candidate pairs → near-dup clusters → one
 * keeper per cluster). Min-label propagation: every vertex starts as its
 * own label and repeatedly takes the minimum of its own and its
 * neighbors' labels; at fixpoint each vertex carries the minimum vertex
 * id of its component.
 *
 * Scale shape: each round is one shuffled join (edges ⋈ labels on dst)
 * plus a groupBy(src) min — all map-side-combinable — and the round count
 * is the component DIAMETER, not the vertex count. Near-dup clusters are
 * dense (candidate pairs come from shared LSH buckets), so diameters are
 * tiny; the driver loop only checks a per-round convergence count (an
 * aggregate, never collected data). Labels localCheckpoint each round to
 * truncate the iterative plan — the standard Spark idiom for fixpoint
 * graph algorithms (same reason GraphX materializes per iteration).
 */
object Components {

  /** pairs: columns (a, b). Returns (doc_id, cluster) for every vertex
    * that appears in a pair; cluster = min vertex id of its component. */
  def components(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v"))
      .localCheckpoint()
    var converged = false
    while (!converged) {
      val nbrMin = edges
        .join(labels.select(col("v").as("dst"), col("lbl").as("dlbl")), "dst")
        .groupBy(col("src")).agg(min(col("dlbl")).as("nlbl"))
      // carry the previous label through the materialization so the
      // convergence check is a scan of the checkpointed rows, not another
      // shuffle join per round
      val next = labels
        .join(nbrMin.select(col("src").as("v"), col("nlbl")), Seq("v"), "left")
        .select(col("v"), col("lbl").as("prev"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      converged = next.where(col("lbl") =!= col("prev")).isEmpty
      freeCheckpoint(labels) // superseded round: next is materialized
      labels = next.select(col("v"), col("lbl"))
    }
    freeCheckpoint(edges) // fixpoint reached: the edge list is done
    labels.select(col("v").as("doc_id"), col("lbl").as("cluster"))
  }

  /**
   * Release a superseded localCheckpoint's storage NOW. `Dataset
   * .unpersist` only covers CacheManager entries; a checkpoint's blocks
   * belong to its INTERNAL RDD, which otherwise stays resident until the
   * Dataset is garbage-collected — measured: two back-to-back runs of a
   * clustering query (a bench cold+steady pair) held both runs' rounds
   * and the second ran 2× slower under the block-memory pressure. The
   * final round's checkpoint (the returned result) is never freed here.
   */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
