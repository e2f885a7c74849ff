package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate kNN GRAPH via NN-Descent (Dong & Charikar & Li, WWW'11) —
 * the all-points nearest-neighbor primitive under HNSW-class indexes,
 * semantic-dedup clustering and graph-based retrieval. Where the IVF/PQ
 * family (ops/Similarity) answers "top-k for THESE queries", NN-Descent
 * builds the top-k list for EVERY corpus point at once, converging on
 * the observation that a neighbor's neighbors are likely neighbors.
 *
 * Spark shape — every step is a keyed equi-join or a bounded window,
 * nothing all-pairs:
 *  - init: a deterministic BUCKETED ring — points hash into id-modulo
 *    buckets sized ~4× the exploration degree, rank within their
 *    bucket, and each point's initial candidates are the next
 *    `descentK` ranks of its bucket (one keyed equi-join on
 *    (bucket, rank+d); bucket-tail points start sparser, which the
 *    descent back-fills) PLUS up to 3 same-rank links into the
 *    following buckets. The cross links are LOAD-BEARING, not a tuning
 *    knob: NN-Descent's candidate rule only ever proposes pairs inside
 *    a connected component, so disconnected init buckets would stay
 *    disconnected forever and cap recall at ~1/buckets (measured:
 *    0.35 vs 0.99 on the spec's clustered corpus) — the same-rank
 *    bucket ring makes the init graph connected (every bucket has a
 *    rank 1). No dense-id assumption (scale corpora re-key with
 *    strides), no global-order window — the ranking windows are
 *    per-bucket and embeddings are unordered w.r.t. ids, so the ring
 *    is as good as a random draw; NN-Descent converges from any start,
 *    the start only prices the rounds.
 *  - round: symmetrize the current graph (2kN rows), self-join on the
 *    shared endpoint to propose neighbors-of-neighbors (≤ (2k)²N
 *    canonical pairs — bounded by k², never by N²), score each
 *    proposal ONCE with the codegen'd fixed-order dot
 *    ([[Similarity.dot]] — bit-identical to the oracle's list_reduce
 *    replay), feed both directions back, and keep each point's top-k
 *    under the TOTAL (dot desc, id asc) order. Dedupe happens on the
 *    LONG pair keys (groupBy p,q + max(dot) of identical doubles) —
 *    never DISTINCT over a double column, whose −0.0 normalization is
 *    engine-specific.
 *  - per-round state localCheckpoints and frees its predecessor (the
 *    Components/Graph fixpoint idiom): plans stay flat, the block
 *    store holds O(kN), and a fixed round count keeps the result
 *    oracle-replayable (the SQL twin unrolls the rounds as CTEs).
 *
 * Returns (vec_id, nbr_id, dot, rnk) — k rows per corpus point.
 * Contract: `emb` has (vec_id: long, dense 0..N−1 — checked loud;
 * embedding: array<float>). Recall vs the exact graph is measured
 * honestly by RecallProbe, not assumed.
 */
object KnnGraph {

  /** `descentK` (≥ k; 0 = k) is the EXPLORATION degree: rounds run the
    * descent over top-descentK lists and only the final output trims to
    * top-k. Percolation speed scales with degree² per round, so a
    * larger descentK buys far more recall per round than extra rounds
    * buy at degree k (measured on a seeded clustered corpus, output
    * recall@5: k=5 alone ×6 rounds = 0.73; descentK=15 ×3 rounds =
    * 0.995 for comparable total candidate work). */
  def nnDescent(emb: DataFrame, k: Int, rounds: Int,
                descentK: Int = 0): DataFrame = {
    require(k >= 1, s"nnDescent: k=$k must be >= 1")
    require(rounds >= 0, s"nnDescent: rounds=$rounds must be >= 0")
    val dk = if (descentK <= 0) k else descentK
    require(dk >= k, s"nnDescent: descentK=$dk must be >= k=$k")
    val e = emb.select(col("vec_id"), col("embedding"))
    // one metadata read: N, and the distinct-id check ranking needs
    // (duplicate ids would make the within-bucket row_number order —
    // and therefore the whole result — nondeterministic)
    val st = e.agg(count(lit(1)), count_distinct(col("vec_id"))).collect()(0)
    val n = st.getLong(0)
    require(n > dk,
      s"nnDescent: descentK=$dk needs more than descentK corpus points, got $n")
    require(st.getLong(1) == n,
      s"nnDescent: vec_id must be distinct (got ${st.getLong(1)} distinct " +
        s"ids over $n rows)")
    val nBuckets = math.max(1L, n / (4L * dk))
    // md5-hash bucketing, not id % nBuckets: strided re-keys (every
    // scale corpus) share factors with the bucket count and would
    // collapse whole id families into one bucket — a serialized ranking
    // window and a lost bucket ring. The md5 convention is the engine's
    // one cross-engine-replayable hash (functions/Md5HighBits).
    val ranked = e.select(col("vec_id"))
      .withColumn("b", pmod(
        graft.functions.Md5HighBits.hash60(col("vec_id").cast("string")),
        lit(nBuckets)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("b")).orderBy(col("vec_id"))))
    val rhs = ranked.select(col("b"), col("rn"), col("vec_id").as("q"))
    val inBucket = ranked
      .withColumn("d", explode(sequence(lit(1), lit(dk))))
      .select(col("b"), col("vec_id").as("p"),
        (col("rn") + col("d")).as("rn"))
      .join(rhs, Seq("b", "rn"))
      .select(col("p"), col("q"))
    val nCross = math.min(3L, nBuckets - 1)
    val init =
      if (nCross < 1) inBucket
      else inBucket.unionByName(ranked
        .withColumn("d", explode(sequence(lit(1), lit(nCross))))
        .select(pmod(col("b") + col("d"), lit(nBuckets)).as("b"),
          col("vec_id").as("p"), col("rn"))
        .join(rhs, Seq("b", "rn"))
        .select(col("p"), col("q")))
    // Scoring-join strategy (r12, the 1000x ENOSPC fix): the candidate
    // pairs dominate every round (≤ (2dk)²N rows), and a sort-merge
    // scoring join would shuffle each pair TWICE with a vector payload
    // attached — at 5M 64-dim vectors that is hundreds of GB of shuffle
    // for 16-byte logical pairs. When the corpus itself fits a
    // broadcast (≤2 GB estimated — 64-dim float corpora to ~8M
    // vectors), pin it broadcast on BOTH scoring joins: the pairs then
    // never shuffle for scoring at all, and the only fact-scale
    // exchanges left are the pair-key distinct and the top-k window
    // (24-byte rows). Beyond the broadcast regime the hint drops away
    // and the shuffle join remains the honest cost. Join strategy only
    // — results are bit-identical either way.
    val dim = e.select(org.apache.spark.sql.functions
      .size(col("embedding"))).head.getInt(0)
    val eScore = if (n * (4L * dim + 24L) <= (2L << 30)) broadcast(e) else e
    val w = Window.partitionBy(col("p"))
      .orderBy(col("dot").desc, col("q").asc)
    // (p, q, dot), ≤ dk per p — the cross links can push a point past
    // dk, so the init trims through the same total order the rounds use
    var edges = score(eScore, init)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= dk).drop("rnk")
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val u = edges.select(col("p"), col("q"))
        .unionByName(edges.select(col("q").as("p"), col("p").as("q")))
        .distinct()
      val cand = u.as("x").join(u.as("y"),
          col("x.p") === col("y.p") && col("x.q") < col("y.q"))
        .select(col("x.q").as("p"), col("y.q").as("q"))
        .distinct()
      val scored = score(eScore, cand)
      val next = edges
        .unionByName(scored)
        .unionByName(scored.select(col("q").as("p"), col("p").as("q"),
          col("dot")))
        .groupBy(col("p"), col("q")).agg(max(col("dot")).as("dot"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= dk).drop("rnk")
        .localCheckpoint()
      freeCheckpoint(edges)
      edges = next
    }
    edges
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
      .select(col("p").as("vec_id"), col("q").as("nbr_id"),
        col("dot"), col("rnk"))
  }

  /** Undirected adjacency over the directed top-k lists: out ∪ in,
    * deduped — (p, c). Run ONCE at index build ([[graft.core.Catalog
    * .createKnnIndex]] persists the result in the `_knn/adj` sidecar)
    * so the serving path never pays the O(|E|) union+distinct per
    * query batch (at 1000× that was 50M edges and the dominant cost
    * of a 25-query read). Symmetrize-at-build ≡ symmetrize-at-read —
    * the adjacency is a set either way (KnnIndexSpec pins it). */
  def symmetrize(graph: DataFrame): DataFrame =
    graph.select(col("vec_id").as("p"), col("nbr_id").as("c"))
      .unionByName(
        graph.select(col("nbr_id").as("p"), col("vec_id").as("c")))
      .distinct()

  /**
   * Graph-served ANN read (r12) — greedy BEAM SEARCH over a stored kNN
   * graph, the HNSW-class serving path on top of [[nnDescent]]'s build:
   * start every query at the `entries` lowest-id graph nodes, then for
   * `hops` rounds expand the current per-query beam through the
   * SYMMETRIZED adjacency (out-edges ∪ in-edges — so refresh-appended
   * `new → old` edges make new nodes reachable without rewriting old
   * adjacency lists), score only UNSEEN candidates against the live
   * corpus, and keep the best `beam` as the next frontier. The answer
   * is the top-k of everything scored along the way.
   *
   * Spark shape per hop: frontier (Q·beam rows) equi-joins the
   * adjacency (≤ 2·degree fan-out), an anti-join against the visited
   * set dedupes, and scoring is one keyed equi-join against the corpus
   * — the corpus itself never shuffles (the candidate side is
   * driver-small and broadcasts), so at 100 TB a search batch touches
   * O(Q · beam · degree · hops) embedding lookups, never a scan.
   * Deterministic end to end: fixed seeds, fixed hop count, the
   * codegen'd fixed-order dot, and the TOTAL (dot desc, id asc) order
   * at every trim — the SQL oracle unrolls the hops as CTEs and
   * hash-matches. Scoring joins the LIVE corpus, so vectors deleted
   * since the graph build drop here (stale edges only waste beam
   * slots), the same vintage contract as the IVF-PQ re-rank.
   *
   * `emb`: (vec_id, embedding) live corpus; `adj`: (p, c) SYMMETRIZED
   * adjacency ([[symmetrize]] — served from the durable `_knn/adj`
   * sidecar, never recomputed per batch); `queries`: (qid, qe).
   * Returns (qid, vec_id, dot, rnk) — k rows per query.
   */
  def beamSearch(emb: DataFrame, adj: DataFrame, queries: DataFrame,
                 k: Int, beam: Int, hops: Int, entries: Int): DataFrame = {
    require(k >= 1 && beam >= 1 && hops >= 0 && entries >= 1,
      s"beamSearch: k=$k, beam=$beam, hops=$hops, entries=$entries " +
        "must all be positive")
    val e = emb.select(col("vec_id"), col("embedding"))
    val q = queries.select(col("qid"), col("qe"))
    // every graph node appears as a source in the symmetrized
    // adjacency, so the p-projection is exactly the node set
    val seeds = adj.select(col("p").as("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(entries)
    def scoreIds(ids: DataFrame): DataFrame = ids
      .join(e, "vec_id")
      .join(q, "qid")
      .select(col("qid"), col("vec_id"),
        Similarity.dot(col("qe"), col("embedding")).as("dot"))
    val byQ = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    val s0 = scoreIds(q.select(col("qid")).distinct().crossJoin(seeds))
    var visited = s0.select(col("qid"), col("vec_id"))
    var frontier = s0.withColumn("_r", row_number().over(byQ))
      .where(col("_r") <= beam).drop("_r")
    var all = s0
    for (_ <- 1 to hops) {
      val cand = frontier
        .join(adj, frontier("vec_id") === adj("p"))
        .select(col("qid"), col("c").as("vec_id")).distinct()
        .join(visited, Seq("qid", "vec_id"), "left_anti")
      val scored = scoreIds(cand)
      visited = visited.unionByName(scored.select(col("qid"), col("vec_id")))
      all = all.unionByName(scored)
      frontier = scored.withColumn("_r", row_number().over(byQ))
        .where(col("_r") <= beam).drop("_r")
    }
    all.withColumn("rnk", row_number().over(byQ).cast("bigint"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("dot"), col("rnk"))
  }

  /** Score pairs with two keyed equi-joins against the corpus — the
    * pair table shuffles, the corpus broadcasts when small. */
  private def score(e: DataFrame, pairs: DataFrame): DataFrame =
    pairs
      .join(e.select(col("vec_id").as("p"), col("embedding").as("pe")), "p")
      .join(e.select(col("vec_id").as("q"), col("embedding").as("qe")), "q")
      .select(col("p"), col("q"),
        Similarity.dot(col("pe"), col("qe")).as("dot"))

  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
