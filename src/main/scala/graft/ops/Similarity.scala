package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Similarity search over an embedding column (array<float>).
 *
 * Exactness: the dot product is a FIXED-ORDER sequential double fold over
 * the vector elements — `aggregate` evaluates left-to-right within each
 * row, so the float-addition order is part of the operator's definition,
 * not an artifact of partitioning (the sum is array-local, never
 * distributed). DuckDB's `list_reduce` folds in the same order, giving
 * bit-identical IEEE results. (Decimal accumulation was tried and rejected:
 * Spark casts double→decimal via Double.toString — shortest representation
 * — while DuckDB rounds the exact binary value, so the two disagree in the
 * last decimal digit no matter the scale.)
 *
 * Scale: brute-force top-k broadcasts the Q query vectors and streams the
 * corpus once — embarrassingly parallel, per-partition top-k before the
 * final k·Q-row shuffle. The IVF path buckets by a coarse centroid id and
 * probes only the query's bucket(s): work drops to ~1/C of the corpus.
 */
object Similarity {

  /** Deterministic double inner product: per-element exact float→double
    * widening and IEEE multiply, then a left-to-right fold — compiled to a
    * primitive codegen loop (graft.functions.DotProduct); `dotHof` is the
    * declarative equivalent kept as the semantic reference. */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  /** Declarative twin of [[dot]] via higher-order functions — identical
    * bit-for-bit, ~50× slower (interpreted lambda per element). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /**
   * Brute-force top-k: every (query, corpus) pair scored; rank by exact
   * dot desc with vec_id tiebreak. `queries` must be small — it is
   * broadcast to every partition of the corpus scan.
   */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    corpus.crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"),
        dot(col("qe"), col("embedding")).as("dot"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
  }

  /**
   * IVF-style ANN: the corpus is bucketed by a coarse quantizer (here the
   * `label` column stands in for nearest-centroid assignment); a query
   * probes only its own bucket. Same output shape as bruteTopK.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    corpus.join(broadcast(queries), col("label") === col("qlabel"))
      .select(col("qid"), col("label"), col("vec_id"),
        dot(col("qe"), col("embedding")).as("dot"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
  }

  /**
   * Full IVF build + probe with a REAL coarse quantizer (no label crutch):
   *
   *   build — `nCentroids` deterministic seed centroids (lowest vec_ids;
   *   a production deployment would refine them with a few Lloyd
   *   iterations — the assignment/probe plans below are unchanged by how
   *   the centroids were obtained); every corpus vector is assigned to
   *   its max-dot centroid by a broadcast of the tiny centroid set and a
   *   per-vector argmax (window over vec_id: ties break to the lowest
   *   centroid id, fully deterministic).
   *
   *   probe — each query vector routes to its `nProbe` NEAREST centroids
   *   (rank ≤ nProbe by the same max-dot order), then ranks the union of
   *   those buckets: ~nProbe/C of the corpus scored per query instead of
   *   all of it. nProbe is the standard IVF recall/cost knob — a true
   *   neighbor whose bucket is the query's SECOND-closest centroid is
   *   invisible at nProbe=1 and found at nProbe=2 (SimilaritySpec plants
   *   exactly that and pins the strict recall improvement).
   *
   * Scale: assignment is a map-only native argmax over the corpus scan —
   * ZERO Exchange on the corpus side until the candidate rows (already
   * stripped to (qid, cid, vec_id, dot) — no embeddings) enter the
   * per-query ranking window, which partitions by query. The centroid
   * set stays driver-small by construction, and the probe fan-out
   * multiplies only the broadcast side (nProbe rows per query), never
   * the corpus scan. PlanAudit pins the no-corpus-Exchange shape.
   */
  def ivfBuildProbe(corpus: DataFrame, queries: DataFrame, k: Int,
                    nCentroids: Int = 16, nProbe: Int = 1,
                    trainIters: Int = 0): DataFrame = {
    val cents =
      if (trainIters > 0) trainedCentroids(corpus, nCentroids, trainIters)
      else seedCentroids(corpus, nCentroids)
    // ONE driver collect (C×D floats) feeds both the corpus assignment and
    // the query routing — the centroid scan runs once, not once per use
    ivfProbePrebuilt(corpus, queries, k, collectCentroids(cents), nProbe)
  }

  /**
   * IVF probe against a PREBUILT centroid set — the deployment shape
   * behind [[graft.core.Catalog.createVectorIndex]]: training ran once
   * at index-build time; a query session loads the stored C×D floats
   * (metadata-scale) and pays ONLY the map-only assignment + bucket
   * probe. Identical plan and semantics to [[ivfBuildProbe]] after its
   * training step (it delegates here), so prebuilt ≡ build-inline on
   * the same centroids, bit for bit.
   */
  def ivfProbePrebuilt(corpus: DataFrame, queries: DataFrame, k: Int,
                       cs: Seq[(Long, Array[Float])],
                       nProbe: Int = 1): DataFrame = {
    val bucketed = assignWith(corpus, cs)
    val routed = probeWith(
        queries.select(col("qid").as("vec_id"), col("qe").as("embedding")),
        cs, nProbe)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
              col("cid").as("qcid"))
    // every corpus vector lives in exactly ONE bucket (argmax assignment),
    // so the multi-bucket join yields each candidate at most once per
    // query — no dedup needed before the ranking window
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    bucketed.join(broadcast(routed), col("cid") === col("qcid"))
      .select(col("qid"), col("cid"), col("vec_id"),
        dot(col("qe"), col("embedding")).as("dot"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
  }

  /**
   * RADIUS (threshold) similarity search over the IVF probe (r14) —
   * "every corpus vector with dot ≥ θ", the range-search companion to
   * top-k that near-dup mining and recall-first retrieval ask for
   * (a fixed k either truncates dense neighborhoods or pads sparse
   * ones; the threshold is the semantic contract). Same approximation
   * contract as [[ivfProbePrebuilt]]: candidates come from each
   * query's `nProbe` nearest buckets (map-only assignment, the
   * centroid set is a driver-small collect, the routed queries
   * broadcast), then the exact fixed-order dot admits against θ — the
   * output is exact-scored over the probed candidate set. Unbounded
   * answer sets are the caller's θ choice; the plan stays
   * O(|probed buckets|) per query, never a corpus scan.
   */
  def ivfRadius(corpus: DataFrame, queries: DataFrame, theta: Double,
                nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val cs = collectCentroids(seedCentroids(corpus, nCentroids))
    val bucketed = assignWith(corpus, cs)
    val routed = probeWith(
        queries.select(col("qid").as("vec_id"), col("qe").as("embedding")),
        cs, nProbe)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
              col("cid").as("qcid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    bucketed.join(broadcast(routed), col("cid") === col("qcid"))
      .select(col("qid"), col("vec_id"),
        dot(col("qe"), col("embedding")).as("dot"))
      .where(col("dot") >= theta)
      .withColumn("rnk", row_number().over(w).cast("bigint"))
  }

  /**
   * PRODUCT-QUANTIZED approximate top-k (the IVF-PQ memory half,
   * Jégou et al., "Product Quantization for Nearest Neighbor Search"):
   * vectors split into `m` subspaces, each quantized against its own
   * `codebookSize`-entry codebook, so a corpus vector is represented by
   * m small code ids instead of D floats. Queries score by ASYMMETRIC
   * distance — per query a lookup table of (subspace × codeword) exact
   * dots is precomputed, and a corpus row's approximate dot is the sum
   * of m table lookups over its codes: the scoring scan reads CODES,
   * never embeddings.
   *
   * Why it matters at 100 TB: brute force streams 4·D bytes per corpus
   * vector per query batch; PQ streams m bytes (m=8, D=512 → 256×
   * less scan bandwidth), with the scoring arithmetic reduced from D
   * multiplies to m array lookups. In deployment the encode runs ONCE
   * (a map-only pass — [[graft.functions.NearestCentroids]] per
   * subspace, zero shuffle) and the code table persists; this operator
   * builds it inline for the driver contract.
   *
   * Determinism: codebooks are the first `codebookSize` vectors'
   * subvectors (the seedCentroids convention); per-subspace assignment
   * ties break to the lowest codeword id; LUT entries are the same
   * fixed-order left-to-right dot the whole engine uses (driver-side
   * here — m·K·(D/m) flops); the m lookup terms add in subspace order.
   * The DuckDB oracle replays all of it bit-for-bit.
   *
   * Exactness bound: when every corpus vector is a per-subspace mixture
   * of codewords the reconstruction is lossless and pqTopK ≡ bruteTopK
   * (SimilaritySpec pins it); on general data the scores are the
   * standard PQ approximation (recall recovered by re-ranking the
   * short-list with exact dots — compose with [[bruteTopK]] over the
   * candidates if needed).
   */
  /** A trained PQ model: per-subspace codebooks (driver-small — K×D
    * floats total), subspace width, subspace count. */
  case class PqModel(
      books: Seq[Seq[(Long, Array[Float])]], sub: Int, m: Int, dims: Int)

  /** Codebooks from the first `codebookSize` corpus vectors, sliced per
    * subspace (the seedCentroids convention — deterministic). */
  private[graft] def pqTrain(corpus: DataFrame, m: Int, codebookSize: Int): PqModel = {
    require(m >= 1 && codebookSize >= 1, s"bad PQ shape: m=$m K=$codebookSize")
    val seeds = corpus.where(col("vec_id") < codebookSize)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    require(seeds.nonEmpty, "pqTrain: empty codebook seed set")
    val dims = seeds.head._2.length
    require(dims % m == 0, s"pqTrain: $dims dims not divisible into $m subspaces")
    val sub = dims / m
    PqModel((0 until m).map(i => seeds.toSeq.map { case (cid, v) =>
      (cid, java.util.Arrays.copyOfRange(v, i * sub, (i + 1) * sub)) }),
      sub, m, dims)
  }

  /** ENCODE (map-only): per subspace, the native argmax over the sliced
    * embedding — slice() and NearestCentroids both codegen. `keep` is
    * carried through (vec_id, and the IVF bucket id in ivfPqRerank —
    * both already on the row, so the pass stays one map). */
  private[graft] def pqEncode(df: DataFrame, pm: PqModel,
                       keep: Seq[Column]): DataFrame =
    df.select(keep ++ (0 until pm.m).map(i =>
      element_at(graft.functions.NearestCentroids.nearest(
        slice(col("embedding"), i * pm.sub + 1, pm.sub), pm.books(i), 1), 1)
        .as(s"code_$i")): _*)

  /** Per-query asymmetric-distance lookup tables, computed on the driver
    * (queries are broadcast-small by the bruteTopK contract):
    * lut_i(c) = exact dot of the query's i-th subvector with codeword c. */
  private def pqLutDf(queries: DataFrame, pm: PqModel): DataFrame = {
    val spark = queries.sparkSession
    val qs = queries.select(col("qid"), col("qe")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    qs.foreach { case (qid, qe) => require(qe.length == pm.dims,
      s"query $qid has ${qe.length} dims, corpus has ${pm.dims}") }
    def dotD(a: Array[Float], off: Int, b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < b.length) { acc += a(off + i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val lutRows = qs.toSeq.map { case (qid, qe) =>
      org.apache.spark.sql.Row.fromSeq(qid +: (0 until pm.m).map(i =>
        pm.books(i).map { case (_, cw) => dotD(qe, i * pm.sub, cw) })) }
    val lutSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("qid",
        org.apache.spark.sql.types.LongType) +:
      (0 until pm.m).map(i => org.apache.spark.sql.types.StructField(s"lut_$i",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false))))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(lutRows).asJava, lutSchema)
  }

  /** Approximate dot: the m LUT lookups added in subspace order
    * (left-assoc — both engines fold identically). */
  private def pqAdot(m: Int): Column =
    (0 until m).map(i =>
      element_at(col(s"lut_$i"), (col(s"code_$i") + 1).cast("int")))
      .reduceLeft(_ + _)

  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 4, codebookSize: Int = 8): DataFrame = {
    val pm = pqTrain(corpus, m, codebookSize)
    val codes = pqEncode(corpus, pm, Seq(col("vec_id")))
    // SCORE: codes scan × broadcast LUTs; approximate dot = the m
    // lookups added in subspace order (left-assoc, both engines)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adot").desc, col("vec_id").asc)
    codes.crossJoin(broadcast(pqLutDf(queries, pm)))
      .select(col("qid"), col("vec_id"), pqAdot(m).as("adot"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
  }

  /**
   * PQ shortlist + EXACT re-rank — the standard production ANN recipe
   * (IVF-PQ papers' ADC + re-ranking step): [[pqTopK]] produces a
   * `kCand`-deep candidate shortlist from the codes scan, then ONLY the
   * shortlisted vectors (Q×kCand rows — broadcast-small) are re-scored
   * with the exact dot and re-ranked to the final k. The expensive
   * full-precision arithmetic touches kCand vectors per query instead
   * of the corpus; the corpus-wide pass stays the m-byte code scan.
   * Output shape matches [[bruteTopK]] (exact `dot`, `rnk` ≤ k).
   */
  def pqRerank(corpus: DataFrame, queries: DataFrame, k: Int,
               kCand: Int = 25, m: Int = 4, codebookSize: Int = 8): DataFrame = {
    require(kCand >= k, s"pqRerank: kCand=$kCand must be >= k=$k")
    val cand = pqTopK(corpus, queries, kCand, m, codebookSize)
      .select(col("qid").as("_cqid"), col("vec_id").as("_cvid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    // the exact pass touches the shortlist only: corpus semi-restricted
    // by the broadcast candidate set, then scored against its query
    corpus.join(broadcast(cand), col("vec_id") === col("_cvid"))
      .join(broadcast(queries), col("qid") === col("_cqid"))
      .select(col("qid"), col("vec_id"),
        dot(col("qe"), col("embedding")).as("dot"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
  }

  /**
   * MATRYOSHKA two-stage retrieval (Kusupati et al.'s MRL deployment
   * recipe): shortlist by the dot over the FIRST `prefixDims`
   * dimensions — an MRL-trained embedding front-loads semantic mass,
   * so a short prefix ranks nearly as well as the full vector — then
   * exact full-dimension re-rank on the Q×kCand shortlist. The
   * compute win is D/prefixDims per scored pair at any layout; the
   * BANDWIDTH win at 100 TB additionally wants the prefix stored as
   * its own column/projection (the engine's projection machinery —
   * here the slice happens post-scan, which this scaladoc is honest
   * about). Same deterministic conventions as every ANN path: fixed-
   * order dots, vec_id-asc ties, the shortlist is rank ≤ kCand on the
   * prefix score.
   */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     kCand: Int = 25, prefixDims: Int = 16): DataFrame = {
    require(kCand >= k, s"matryoshkaTopK: kCand=$kCand must be >= k=$k")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("pdot").desc, col("vec_id").asc)
    val cand = corpus.crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"),
        dot(slice(col("qe"), 1, prefixDims),
            slice(col("embedding"), 1, prefixDims)).as("pdot"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= kCand)
      .select(col("qid").as("_cqid"), col("vec_id").as("_cvid"))
    val w2 = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    corpus.join(broadcast(cand), col("vec_id") === col("_cvid"))
      .join(broadcast(queries), col("qid") === col("_cqid"))
      .select(col("qid"), col("vec_id"),
        dot(col("qe"), col("embedding")).as("dot"))
      .withColumn("rnk", row_number().over(w2).cast("bigint"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("dot"), col("rnk"))
  }

  /**
   * IVF-PQ + exact re-rank — the FULL production ANN recipe (Jégou et
   * al.'s IVFADC): IVF restricts WHICH vectors each query scores (the
   * nProbe routed buckets, ~nProbe/C of the corpus), PQ restricts WHAT
   * is read to score them (m one-byte codes + LUT lookups, never the
   * embedding), and the exact re-rank recovers full precision on the
   * Q×kCand shortlist. Composition of [[ivfProbePrebuilt]]'s routing
   * with [[pqTopK]]'s asymmetric scoring and [[pqRerank]]'s tail.
   *
   * Scale: ONE map-only pass encodes the corpus (bucket id + m codes —
   * IVF assignment and PQ encode fuse into the same projection, zero
   * shuffle); scoring joins the code rows against the BROADCAST
   * (query × probed-bucket × LUT) side, so the only hash Exchange in
   * the whole plan is the per-query rank window over candidate rows
   * that carry three longs and a double. At 100 TB: bandwidth drops
   * ×(D·4/m) from PQ, candidate count drops ×(nProbe/C) from IVF, and
   * both gains multiply.
   *
   * Determinism: seed centroids + seed codebooks (both the first-rows
   * convention), lowest-id tiebreaks everywhere, LUT terms added in
   * subspace order, exact re-rank = the engine's fixed-order dot.
   * The DuckDB oracle replays routing, codes, LUT sums and the re-rank
   * bit for bit.
   */
  def ivfPqRerank(corpus: DataFrame, queries: DataFrame, k: Int,
                  kCand: Int = 25, nCentroids: Int = 16, nProbe: Int = 2,
                  m: Int = 4, codebookSize: Int = 8): DataFrame = {
    val cs = collectCentroids(seedCentroids(corpus, nCentroids))
    val pm = pqTrain(corpus, m, codebookSize)
    // bucket id + PQ codes in ONE map-only projection over the corpus
    val codes = pqEncode(assignWith(corpus, cs), pm,
      Seq(col("vec_id"), col("cid")))
    ivfPqProbePrebuilt(corpus, codes, queries, k, kCand, cs, pm, nProbe)
  }

  /**
   * IVF-PQ probe against a PREBUILT index (the deployment read path
   * behind [[graft.core.Catalog.createIvfPqIndex]]): centroids,
   * codebooks and the per-vector code table were materialized at
   * build time; a query session loads the driver-small model, reads
   * the CODE table (m bytes per vector — never the embeddings) for
   * scoring, and touches `liveCorpus` only for the exact re-rank of
   * the Q×kCand shortlist. Index vintage semantics (the real ANN-index
   * contract): vectors DELETED since the build shortlist from their
   * stale codes but drop at the re-rank's live join (they can never
   * surface — they can only waste shortlist slots); vectors ADDED
   * since the build are invisible until rebuild.
   */
  def ivfPqProbePrebuilt(liveCorpus: DataFrame, codes: DataFrame,
                         queries: DataFrame, k: Int, kCand: Int,
                         cs: Seq[(Long, Array[Float])],
                         pm: PqModel, nProbe: Int): DataFrame = {
    require(kCand >= k, s"ivfPqProbePrebuilt: kCand=$kCand must be >= k=$k")
    // broadcast side: each query's nProbe routed buckets × its LUT
    val routed = probeWith(
        queries.select(col("qid").as("vec_id"), col("qe").as("embedding")),
        cs, nProbe)
      .select(col("vec_id").as("qid"), col("cid").as("qcid"))
    val qlut = routed.join(pqLutDf(queries, pm), "qid")
    // score ONLY the probed buckets' codes; every corpus vector lives in
    // exactly one bucket, so each candidate appears at most once per query
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adot").desc, col("vec_id").asc)
    val cand = codes.join(broadcast(qlut), col("cid") === col("qcid"))
      .select(col("qid"), col("vec_id"), pqAdot(pm.m).as("adot"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= kCand)
      .select(col("qid").as("_cqid"), col("vec_id").as("_cvid"))
    // exact re-rank over the shortlist (pqRerank's tail) — against the
    // LIVE corpus, so stale shortlisted ids drop here
    val w2 = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    liveCorpus.join(broadcast(cand), col("vec_id") === col("_cvid"))
      .join(broadcast(queries), col("qid") === col("_cqid"))
      .select(col("qid"), col("vec_id"),
        dot(col("qe"), col("embedding")).as("dot"))
      .withColumn("rnk", row_number().over(w2).cast("bigint"))
      .where(col("rnk") <= k)
  }

  /** Deterministic seed centroids: the nCentroids lowest vec_ids —
    * driver-small by construction (the set is collected and embedded in
    * the native assignment expression, never joined, so no broadcast
    * hint). */
  def seedCentroids(corpus: DataFrame, nCentroids: Int): DataFrame =
    corpus.where(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))

  /** Nearest-centroid assignment: per-row native argmax of the exact
    * fixed-order dot over the driver-collected centroid set (ties break
    * to the lowest cid) — ONE map-only pass over the corpus, zero
    * Exchange ([[graft.functions.NearestCentroids]]). The window-ranked
    * predecessor shuffled the whole corpus (embedding payloads included)
    * through an Exchange hash-partitioned on the row id, once per
    * assignment pass — once per Lloyd iteration when training. */
  def assignToCentroids(df: DataFrame, cents: DataFrame,
                        idCol: String): DataFrame =
    probeCentroids(df, cents, idCol, nProbe = 1)

  /** The `nProbe` nearest centroids per row (rank ≤ nProbe by dot desc,
    * cid-asc tiebreak) — [[assignToCentroids]] is nProbe = 1; query
    * routing in [[ivfBuildProbe]] uses nProbe ≥ 1 as the recall knob.
    * Emits one row per (id, probed centroid). `idCol` is retained for
    * call-shape compatibility; the native argmax needs no partitioning
    * column. */
  def probeCentroids(df: DataFrame, cents: DataFrame, idCol: String,
                     nProbe: Int): DataFrame =
    probeWith(df, collectCentroids(cents), nProbe)

  /** Driver-side centroid materialization: (cid, vector) pairs,
    * cid-ascending. The set is C×D floats BY CONSTRUCTION (seeded from
    * nCentroids rows or Lloyd-updated through a C×D stats collect) —
    * never corpus-sized, so the collect is a metadata-scale job. */
  def collectCentroids(cents: DataFrame): Seq[(Long, Array[Float])] =
    cents.select(col("cid"), col("ce")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq

  private[graft] def probeWith(df: DataFrame, cs: Seq[(Long, Array[Float])],
                        nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    df.withColumn("cid",
      explode(graft.functions.NearestCentroids.nearest(
        col("embedding"), cs, nProbe)))
  }

  private[graft] def assignWith(df: DataFrame,
                         cs: Seq[(Long, Array[Float])]): DataFrame =
    probeWith(df, cs, nProbe = 1)

  /**
   * Per-group centroid statistics in long format (group, dim) — the UPDATE
   * step of Lloyd's k-means and the building block for per-label mean
   * embeddings.
   *
   * Exactness at scale: raw float/double sums are partition-order-dependent
   * and can never hash-match a single-node oracle, so each component is
   * quantized first — floor(v·10⁶) as a long (float→double widening and the
   * IEEE multiply are engine-identical) — and the LONG sums are associative,
   * exact, and distributable. The final mean is one long→double division,
   * identical in both engines while |sum| < 2⁵³ (|v|≈1 ⇒ holds past 10¹⁰
   * rows per group).
   *
   * Scale: posexplode is narrow (×dims rows, but only (group, dim, long)
   * triples — no text, no vectors — enter the one aggregation shuffle);
   * map-side partial aggregation compacts each task to ≤ groups×dims rows
   * before the exchange.
   */
  def centroidStats(df: DataFrame, by: String): DataFrame =
    df.select(col(by), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col(by), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
           sum(floor(col("v").cast(DoubleType) * 1e6).cast("long")).as("sum_q"))
      .select(col(by), col("dim"), col("n"), col("sum_q"),
              (col("sum_q").cast(DoubleType) / col("n")).as("avg_q"))

  /** One Lloyd k-means step: deterministic seed centroids → exact max-dot
    * assignment → quantized-exact centroid update. Iterating = feeding the
    * emitted means back as the next centroid set; every iteration is the
    * same two plans (broadcast assign + one aggregation shuffle). */
  def kmeansStep(corpus: DataFrame, nCentroids: Int = 10): DataFrame =
    centroidStats(
      assignToCentroids(corpus, seedCentroids(corpus, nCentroids), "vec_id"),
      "cid")

  /**
   * Full Lloyd loop: `iters` assign→update rounds, feeding each round's
   * means back as the next centroid set. Collecting the centroids to the
   * driver between rounds is the correct distributed shape — the set is
   * C×D floats by construction (never corpus-sized), while the per-round
   * corpus work stays exactly [[assignToCentroids]] + [[centroidStats]]:
   * one map-only argmax pass plus one aggregation shuffle of
   * (cid, dim, long) triples, per iteration. Returns the final
   * (vec_id, cid) assignment.
   */
  def kmeansIterate(corpus: DataFrame, nCentroids: Int = 10,
                    iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    var cents = seedCentroids(corpus, nCentroids)
    var assigned = assignToCentroids(corpus, cents, "vec_id")
    for (_ <- 2 to iters) {
      cents = lloydUpdate(spark, assigned, cents)
      assigned = assignToCentroids(corpus, cents, "vec_id")
    }
    assigned.select(col("vec_id"), col("cid"))
  }

  /** One Lloyd UPDATE: quantized-exact per-cluster means, collected to
    * the driver (C×D floats by construction — never corpus-sized) and
    * re-broadcast as the next centroid set. A cluster that captured no
    * vectors this round vanishes from the stats; its previous centroid
    * carries forward so k never silently shrinks between iterations
    * (standard Lloyd practice — dropping it would change the output
    * arity under the caller with no signal). */
  private def lloydUpdate(spark: org.apache.spark.sql.SparkSession,
                          assigned: DataFrame, cents: DataFrame): DataFrame = {
    import spark.implicits._
    val prev: Map[Long, Seq[Float]] = cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val stats = centroidStats(assigned, "cid")
      .select(col("cid"), col("dim"), col("avg_q")).collect()
    val updated = stats.groupBy(_.getLong(0)).map { case (cid, rs) =>
      (cid, rs.sortBy(_.getLong(1)).toSeq.map(r => (r.getDouble(2) / 1e6).toFloat))
    }
    (prev ++ updated).toSeq.sortBy(_._1).toDF("cid", "ce")
  }

  /**
   * TRAINED coarse quantizer for the IVF build: `iters` Lloyd rounds from
   * the deterministic seed set, returning the refined CENTROIDS (the
   * [[kmeansIterate]] loop, exposed at the point [[ivfBuildProbe]] plugs
   * in). Why it matters at 100 TB: seed centroids are whatever the first
   * nCentroids vectors happened to be, so on a clustered real corpus the
   * buckets skew — a hot bucket makes its probes scan far more than the
   * nominal 1/C of the corpus. Lloyd rounds move the centroids toward
   * the data's actual modes, flattening bucket occupancy (measured at
   * sf0.1 in SURVEY §5) while every downstream plan — assignment, probe,
   * ranking — is IDENTICAL by construction: training only changes the
   * centroid values, deterministically (exact quantized means, fixed
   * seed, cid-ascending ties), so the build stays reproducible.
   */
  def trainedCentroids(corpus: DataFrame, nCentroids: Int = 16,
                       iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    var cents = seedCentroids(corpus, nCentroids)
    for (_ <- 1 to iters)
      cents = lloydUpdate(spark,
        assignToCentroids(corpus, cents, "vec_id"), cents)
    cents
  }
}
