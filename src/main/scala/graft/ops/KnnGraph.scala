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
    // one metadata read: N, the distinct-id check (duplicate ids would
    // make the within-bucket row_number order — and therefore the whole
    // result — nondeterministic), and the max dimension for the corpus
    // size estimate (max over non-null sizes: a null or ragged
    // embedding can only make the estimate conservative, never throw)
    val st = e.agg(count(lit(1)), count_distinct(col("vec_id")),
      max(org.apache.spark.sql.functions.size(col("embedding")))).collect()(0)
    val n = st.getLong(0)
    require(n > dk,
      s"nnDescent: descentK=$dk needs more than descentK corpus points, got $n")
    require(st.getLong(1) == n,
      s"nnDescent: vec_id must be distinct (got ${st.getLong(1)} distinct " +
        s"ids over $n rows)")
    require(!st.isNullAt(2) && st.getInt(2) > 0,
      "nnDescent: embedding must be a non-empty array<float> column")
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
    // Scoring-join strategy (r12 broadcast, r13 block-local): the
    // candidate pairs dominate every round (≤ (2dk)²N rows), and a
    // sort-merge scoring join would shuffle each pair TWICE with a
    // vector payload attached — at 5M 64-dim vectors that is hundreds
    // of GB of shuffle for 16-byte logical pairs (the r12a ENOSPC).
    // Two scale regimes, both shipping the CORPUS to the pairs instead:
    //  - corpus ≤ spark.graft.knn.broadcastBytes (default scales with
    //    the JVM: min(2 GB, maxMemory/8) — the in-memory HashedRelation
    //    is several times the raw estimate, so raw ≤ mem/8 keeps the
    //    relation comfortably inside the heap; small-executor clusters
    //    shrink the cap automatically instead of OOMing): pin it
    //    broadcast on BOTH scoring joins; the pairs never shuffle for
    //    scoring at all.
    //  - beyond that: GRID-partitioned block scoring ([[blockScore]]) —
    //    pairs hash into (block(p), block(q)) cells, each corpus block
    //    (≤ spark.graft.knn.blockBytes) replicates to its row/column of
    //    cells, and a streaming per-cell hash join scores map-side. The
    //    pairs still shuffle only their 16-byte keys; total exchange is
    //    2·B·|corpus| + |pairs| — linear in N at fixed block size,
    //    never |pairs|·|vector|.
    // Join strategy only — results are bit-identical across all paths
    // (KnnGraphSpec pins broadcast ≡ block). spark.graft.knn.scoring =
    // auto|broadcast|block forces a path for A/B measurement.
    val dim = st.getInt(2)
    val conf = e.sparkSession.conf
    val bytesEst = n * (4L * dim + 24L)
    val bcastCap = conf.get("spark.graft.knn.broadcastBytes",
      math.min(2L << 30, Runtime.getRuntime.maxMemory / 8).toString).toLong
    val blockBytes = conf.get("spark.graft.knn.blockBytes",
      (256L << 20).toString).toLong
    val useBroadcast = conf.get("spark.graft.knn.scoring", "auto") match {
      case "broadcast" => true
      case "block" => false
      case _ => bytesEst <= bcastCap
    }
    val scoreFn: DataFrame => DataFrame =
      if (useBroadcast) { val eb = broadcast(e); pairs => score(eb, pairs) }
      else {
        val b = math.max(2L, (bytesEst + blockBytes - 1) / blockBytes)
          .min(1024L).toInt
        pairs => blockScore(e, pairs, b)
      }
    val w = Window.partitionBy(col("p"))
      .orderBy(col("dot").desc, col("q").asc)
    // (p, q, dot), ≤ dk per p — the cross links can push a point past
    // dk, so the init trims through the same total order the rounds use
    var edges = scoreFn(init)
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
      val scored = scoreFn(cand)
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
                 k: Int, beam: Int, hops: Int, entries: Int,
                 /** GLOBAL entry-point override — (vec_id, rnk) rows
                   * (e.g. the degree-ranked experiment, RecallProbe);
                   * the `entries` best ranks start EVERY query. None =
                   * the `entries` lowest node ids. Measured r13:
                   * degree-ranked seeds LOSE at small beams — the
                   * production lever is `perQuerySeeds`. */
                 seedsOverride: Option[DataFrame] = None,
                 /** PER-QUERY entry points — (qid, vec_id) rows (r14:
                   * [[graft.core.Catalog.knnSearch]] routes each query
                   * to its nearest trained centroid's lowest-id members
                   * from the `_knn/seeds` sidecar). Wins over
                   * seedsOverride. Seeds change RECALL, never validity
                   * (KnnIndexSpec pins it): every hop still scores
                   * against the live corpus with the same total order. */
                 perQuerySeeds: Option[DataFrame] = None,
                 /** ADMISSION set (r14 filtered search) — (vec_id) rows;
                   * the answer top-k admits only these. Traversal stays
                   * UNFILTERED (the standard filtered-HNSW rule:
                   * non-matching nodes still guide the beam through the
                   * graph — filtering the frontier would disconnect it
                   * under selective predicates and collapse recall).
                   * Recall under a selective filter is bought with a
                   * wider beam, the same ef knob as always. */
                 admit: Option[DataFrame] = None,
                 /** RADIUS admission (r14): only scored candidates with
                   * dot ≥ θ enter the answer (ranked 1..n after the
                   * cut; `k` stays as the output safety cap). Same
                   * approximation contract as the beam itself — the
                   * answer is exact-scored over what the beam explored;
                   * widen beam/hops to push the explored frontier past
                   * the radius. */
                 minDot: Option[Double] = None): DataFrame = {
    require(k >= 1 && beam >= 1 && hops >= 0 && entries >= 1,
      s"beamSearch: k=$k, beam=$beam, hops=$hops, entries=$entries " +
        "must all be positive")
    val e = emb.select(col("vec_id"), col("embedding"))
    val q = queries.select(col("qid"), col("qe"))
    // every graph node appears as a source in the symmetrized
    // adjacency, so the p-projection is exactly the node set
    val seeds = seedsOverride
      .map(_.orderBy(col("rnk")).limit(entries).select(col("vec_id")))
      .getOrElse(adj.select(col("p").as("vec_id")).distinct()
        .orderBy(col("vec_id")).limit(entries))
    def scoreIds(ids: DataFrame): DataFrame = ids
      .join(e, "vec_id")
      .join(q, "qid")
      .select(col("qid"), col("vec_id"),
        Similarity.dot(col("qe"), col("embedding")).as("dot"))
    val byQ = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    val seedPairs = perQuerySeeds
      .map(_.select(col("qid"), col("vec_id")).distinct())
      .getOrElse(q.select(col("qid")).distinct().crossJoin(seeds))
    // Each hop's scored batch has THREE consumers (visited, all, next
    // frontier), and each hop's plan nests the previous hop's — left
    // lazy, the logical plan duplicates every earlier hop's join work
    // multiplicatively with depth (ReusedExchange recovers only the
    // exchange-shaped parts at runtime). localCheckpoint per hop — the
    // Components/nnDescent fixpoint idiom — executes each hop exactly
    // once and keeps the serving plan flat; values are untouched, the
    // hop-unrolled SQL oracle still hash-matches (r14, measured:
    // ann_knn_search steady 5.3s → see OPTIMIZATION_r14.md).
    val s0 = scoreIds(seedPairs).localCheckpoint()
    var visited = s0.select(col("qid"), col("vec_id"))
    var frontier = s0.withColumn("_r", row_number().over(byQ))
      .where(col("_r") <= beam).drop("_r")
    var all = s0
    for (_ <- 1 to hops) {
      val cand = frontier
        .join(adj, frontier("vec_id") === adj("p"))
        .select(col("qid"), col("c").as("vec_id")).distinct()
        .join(visited, Seq("qid", "vec_id"), "left_anti")
      val scored = scoreIds(cand).localCheckpoint()
      visited = visited.unionByName(scored.select(col("qid"), col("vec_id")))
      all = all.unionByName(scored)
      frontier = scored.withColumn("_r", row_number().over(byQ))
        .where(col("_r") <= beam).drop("_r")
    }
    val admitted = admit
      .map(a => all.join(a.select(col("vec_id")).distinct(),
        Seq("vec_id"), "left_semi"))
      .getOrElse(all)
    val thresholded = minDot
      .map(t => admitted.where(col("dot") >= t))
      .getOrElse(admitted)
    thresholded.withColumn("rnk", row_number().over(byQ).cast("bigint"))
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

  /**
   * GRID-partitioned pair scoring (r13) — the beyond-broadcast regime
   * of the NN-Descent build. The fragment-replicate join classic: the
   * corpus splits into B hash blocks of ≤ blockBytes each; a pair
   * (p, q) belongs to cell (block(p), block(q)); each corpus row
   * replicates to its B row-cells (as the p side) and B column-cells
   * (as the q side); everything exchanges ONCE keyed by cell; and a
   * per-cell streaming hash join scores map-side — the two fragments
   * (≤ 2·blockBytes) load into memory, the cell's pairs stream through.
   *
   * Exchange totals: 2·B·|corpus| bytes of vectors + the pairs' 24-byte
   * keys — at 8M×64-dim and B=9 that is ~40 GB, vs hundreds of GB for
   * the pair-carries-vector sort-merge this replaces (the r12a ENOSPC).
   * Everything is Dataset-typed (UnsafeRow exchanges — no RDD/Kryo
   * path), the local sort puts both fragments ahead of their cell's
   * pairs, and 4·B² hash partitions keep cell collisions (and so peak
   * task memory) low. The dot replicates [[graft.functions.DotProduct]]
   * bit-for-bit: float→double widening, IEEE multiply, left fold from
   * 0.0, length mismatch → null.
   */
  private def blockScore(e: DataFrame, pairs: DataFrame, b: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    def blk(c: org.apache.spark.sql.Column) =
      pmod(graft.functions.Md5HighBits.hash60(c.cast("string")), lit(b.toLong))
    val reps = explode(sequence(lit(0L), lit(b - 1L)))
    val corpusP = e.withColumn("_j", reps)
      .select((blk(col("vec_id")) * b + col("_j")).as("cell"),
        lit(0).as("kind"), col("vec_id").as("a"), lit(0L).as("bb"),
        col("embedding").as("emb"))
    val corpusQ = e.withColumn("_j", reps)
      .select((col("_j") * b + blk(col("vec_id"))).as("cell"),
        lit(1).as("kind"), col("vec_id").as("a"), lit(0L).as("bb"),
        col("embedding").as("emb"))
    val pairCells = pairs
      .select((blk(col("p")) * b + blk(col("q"))).as("cell"),
        lit(2).as("kind"), col("p").as("a"), col("q").as("bb"),
        lit(null).cast("array<float>").as("emb"))
    val nP = math.max(
      spark.conf.get("spark.sql.shuffle.partitions").toInt, 4 * b * b)
    corpusP.unionByName(corpusQ).unionByName(pairCells)
      .repartition(nP, col("cell"))
      .sortWithinPartitions(col("cell"), col("kind"))
      .as[(Long, Int, Long, Long, Array[Float])]
      .mapPartitions { it =>
        // cells arrive contiguously (local sort): per cell, load the two
        // fragments (kind 0 then 1), stream the pairs (kind 2)
        var cur = Long.MinValue
        val pm = new scala.collection.mutable.LongMap[Array[Float]]()
        val qm = new scala.collection.mutable.LongMap[Array[Float]]()
        it.flatMap { case (cell, kind, a, bb, emb) =>
          if (cell != cur) { cur = cell; pm.clear(); qm.clear() }
          kind match {
            case 0 => pm(a) = emb; Iterator.empty
            case 1 => qm(a) = emb; Iterator.empty
            case _ =>
              val pe = pm(a)
              val qe = qm(bb)
              // null embeddings yield a null dot — mirroring
              // DotProduct.nullSafeEval, so the block path stays
              // bit-identical to the broadcast path (whose null rows
              // rank last and are trimmed) instead of NPE'ing the job
              if (pe == null || qe == null || pe.length != qe.length)
                Iterator.single((a, bb, null: java.lang.Double))
              else {
                var s = 0.0
                var i = 0
                while (i < pe.length) {
                  s += pe(i).toDouble * qe(i).toDouble; i += 1
                }
                Iterator.single((a, bb, java.lang.Double.valueOf(s)))
              }
          }
        }
      }
      .toDF("p", "q", "dot")
  }

  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
