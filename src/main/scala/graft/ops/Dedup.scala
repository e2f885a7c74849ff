package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextOps._

/**
 * Deduplication family for LLM-data pipelines. Every member is
 * shuffle-on-signature — candidates come from joining on a computed key
 * (hash, band bucket, bit chunk, centroid), never from an O(n²) cross
 * join — so each scales linearly in corpus size × signature width:
 *
 *   - exact:     group by md5(text)
 *   - jaccard:   shared-shingle candidate join (df-capped), exact verify
 *   - minhash:   K-member md5 hash family → bands → bucket join (LSH)
 *   - simhash:   60-bit sign-aggregated token hash → 15-bit chunk join
 *                (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 of 4 chunks equal)
 *   - embedding: random-hyperplane LSH buckets → same-bucket cosine verify
 *
 * The reference has no dedup surface; this is the training-data-pipeline
 * extension mandated by SURVEY.md §2 #29–33.
 */
object Dedup {

  /** Exact clusters: one row per distinct text hash with size and keeper
    * (min doc_id — the record a dedup pass would retain). */
  def exactClusters(corpus: DataFrame): DataFrame =
    corpus
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("sz"), min(col("doc_id")).as("keeper"))

  /**
   * Streaming exact dedup with BOUNDED state: emit the first occurrence
   * of each text hash, and EVICT a hash's state row once the event-time
   * watermark passes its arrival time + `ttl`
   * (`dropDuplicatesWithinWatermark` — state is bounded by the hashes
   * seen within one TTL window, not by all hashes ever).
   *
   * This is the at-scale answer to complete-mode streaming dedup
   * ([[exactClusters]] over a stream keeps one state row per distinct
   * hash FOREVER — billions of rows at 100 TB): near-in-time duplicates
   * (crawl re-fetches, retry storms — the dominant streaming dup class)
   * dedup with watermark-bounded state, while full-history dedup against
   * the standing corpus belongs to the batch `incrementalPairs` shape
   * (new batch vs corpus, no unbounded streaming state either).
   *
   * A duplicate arriving AFTER its hash's state was evicted re-emits —
   * the documented TTL trade. Callers that need a deterministic drain
   * (the driver oracle) choose a TTL covering the drained window's whole
   * event-time span, making the result exactly one row per distinct
   * hash; only hash-determined columns are then safe to project (which
   * physical duplicate is kept is arrival order).
   */
  def exactFirstWithinTtl(stream: DataFrame, eventCol: String,
                          ttl: String): DataFrame =
    stream
      .withColumn("h", md5(col("text")))
      .withWatermark(eventCol, ttl)
      .dropDuplicatesWithinWatermark("h")

  private def docShingles(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      explode(shingles(tokens(col("text")))).as("sh"))

  /**
   * N-gram Jaccard near-dup pairs. Blocking key = shingle: ONE aggregation
   * groups each shingle's (sorted) document list via
   * [[graft.functions.CollectCapped]], pairs explode from each list
   * in-place (bounded by the cap, so never C(corpus,2)), and the per-pair
   * intersection count is a count over the exploded pairs. Shuffles:
   * shingle-group, pair-count, doc-sizes — no self-join, no sort.
   *
   * Boilerplate guard: a shingle occurring in m documents would yield
   * C(m,2) pairs, so one hot boilerplate shingle could go quadratic on a
   * real corpus. `collect_capped` saturates its buffer at `maxShingleDf`+1
   * elements and evals to NULL past the cap, so hot shingles cost O(cap)
   * memory and are dropped from the representation (the standard
   * stop-shingle trick) in the SAME pass that builds the groups — no
   * separate df-count shuffle. Jaccard stays a true Jaccard over the
   * filtered shingle universe (sizes and intersections use the same
   * filtered sets). The default cap is far above any test-SF df (max 8 at
   * sf0.1), so planted-dup recall — and the oracle hash — are unchanged.
   */
  def jaccardPairs(corpus: DataFrame, threshold: Double,
                   maxShingleDf: Int = 128): DataFrame =
    overlapPairs(corpus, maxShingleDf)
      .withColumn("jac", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jac") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"), col("jac"))

  /**
   * N-gram CONTAINMENT near-dup pairs: inter / min(|A|, |B|) — the
   * asymmetric overlap measure that catches SUBSET duplication (a short
   * document wholly quoted inside a longer one), which symmetric Jaccard
   * dilutes toward 0 as the length ratio grows: a doc fully contained in
   * one 3× its size has containment 1.0 but Jaccard ≤ 1/3. Same blocking
   * structure, same boilerplate cap, same shuffle profile as
   * [[jaccardPairs]] — only the final scalar differs (one division of
   * exact longs in both engines).
   */
  def containmentPairs(corpus: DataFrame, threshold: Double,
                       maxShingleDf: Int = 128): DataFrame =
    overlapPairs(corpus, maxShingleDf)
      .withColumn("cont", col("inter") / least(col("na"), col("nb")))
      .where(col("cont") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"), col("cont"))

  /** Shared shingle-overlap core of [[jaccardPairs]]/[[containmentPairs]]:
    * (a, b, inter, na, nb) for every pair sharing ≥1 sub-cap shingle. */
  private def overlapPairs(corpus: DataFrame, maxShingleDf: Int): DataFrame = {
    import graft.functions.CollectCapped.collectCapped
    // group on the 60-bit md5 shingle hash, not the shingle string: the
    // grouping shuffle ships 8-byte keys instead of ~30-byte 5-grams. The
    // oracle mirrors the SAME hash (md5 is bit-identical in DuckDB), so
    // even a hash collision — which would merge two shingle groups —
    // affects both engines identically instead of breaking parity.
    val groups = docShingles(corpus)
      .select(tokenHash(col("sh")).as("h"), col("doc_id"))
      .groupBy(col("h"))
      .agg(collectCapped(col("doc_id"), maxShingleDf).as("docs"))
      .where(col("docs").isNotNull)
      .select(col("docs"))
    // both consumers share the shingle-group exchange (ReuseExchange)
    val sizes = groups.select(explode(col("docs")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // docs is sorted ascending (CollectCapped.eval), so (docs[i], docs[j])
    // with i < j enumerates exactly the a < b pairs
    val pairsOf = flatten(transform(col("docs"), (x, i) =>
      transform(slice(col("docs"), i + lit(2), size(col("docs"))),
        y => struct(x.as("a"), y.as("b")))))
    groups.where(size(col("docs")) >= 2)
      .select(explode(pairsOf).as("p"))
      // under a collision one doc can appear twice in a group's list;
      // keep the strict a < b pairs exactly as the oracle's join does
      .where(col("p.a") < col("p.b"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
  }

  /**
   * MinHash signatures (K members of the md5 hash family, min over
   * shingles) banded into K/rowsPerBand LSH buckets; pairs sharing any
   * bucket are near-dup candidates. Probability a pair with Jaccard j
   * collides: 1-(1-j^r)^b — the standard S-curve.
   *
   * The signature is computed NARROWLY — per-document `array_min` over the
   * shingle array, never exploding shingles into rows — so the only
   * shuffles are over the banded signatures (K/r rows per doc): the bucket
   * grouping and the final pair distinct. (The r1 form exploded
   * doc×shingle rows through a groupBy(doc_id) — the corpus-sized shuffle
   * was the whole cost of the operator.) Each md5 digest is evaluated once
   * per shingle and feeds 4 hash-family members (TextOps.hashMember
   * layout). Bucket groups use the same [[graft.functions.CollectCapped]]
   * primitive as jaccard: a degenerate hot bucket (all-identical
   * boilerplate docs) costs O(cap) memory and is dropped rather than
   * expanding C(m,2) pairs — `maxBucket` is far above any test-SF bucket
   * size, so the oracle hash is unchanged.
   */
  /** (doc_id, band, bucket) LSH band rows for every doc — the shared
    * blocking structure of [[minhashCandidates]] (within-corpus) and
    * [[minhashCrossCandidates]] (new-batch-vs-corpus). */
  private def bandedSignatures(corpus: DataFrame, k: Int,
                               rowsPerBand: Int): DataFrame = {
    import graft.functions.MinhashSignature.minhashSignature
    require(k % 4 == 0 && k % rowsPerBand == 0)
    val sig = corpus
      .select(col("doc_id"),
        minhashSignature(shingles(tokens(col("text"))), k).as("mhs"))
      // a NULL signature (null/empty text) must not band: null members
      // concat_ws into the SAME '' bucket, pairing all such docs
      .where(col("mhs").isNotNull)
      .select(col("doc_id") +:
        (0 until k).map(i => element_at(col("mhs"), i + 1).as(s"mh$i")): _*)
    val bands = (0 until k / rowsPerBand).map { j =>
      val members = (0 until rowsPerBand).map(r => col(s"mh${j * rowsPerBand + r}"))
      struct(lit(j).as("band"), concat_ws("_", members: _*).as("bucket"))
    }
    sig.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  def minhashCandidates(corpus: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
                        maxBucket: Int = 1024): DataFrame = {
    import graft.functions.CollectCapped.collectCapped
    val groups = bandedSignatures(corpus, k, rowsPerBand)
      .groupBy(col("band"), col("bucket"))
      .agg(collectCapped(col("doc_id"), maxBucket).as("docs"))
      .where(col("docs").isNotNull && size(col("docs")) >= 2)
    val pairsOf = flatten(transform(col("docs"), (x, i) =>
      transform(slice(col("docs"), i + lit(2), size(col("docs"))),
        y => struct(x.as("a"), y.as("b")))))
    groups.select(explode(pairsOf).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /**
   * Incremental (cross-corpus) near-dup candidates: which docs of a NEW
   * batch already exist — as near-duplicates — in the standing corpus.
   * The continuous-ingestion twin of [[minhashCandidates]]: both sides
   * band with the SAME LSH structure and only cross-side bucket matches
   * are candidates (new×new and corpus×corpus pairs are not re-examined —
   * the standing corpus is already deduped). Shuffle is on (band, bucket)
   * for both sides; the new batch is typically tiny relative to the
   * corpus, so AQE broadcasts it and the corpus-side banding streams.
   */
  def minhashCrossCandidates(corpus: DataFrame, newBatch: DataFrame,
                             k: Int = 8, rowsPerBand: Int = 2,
                             maxBucket: Int = 1024): DataFrame = {
    import graft.functions.CollectCapped.collectCapped
    // Both sides group per (band, bucket) through the same capped buffer
    // as minhashCandidates: a degenerate hot bucket (templated boilerplate
    // on either side) costs O(cap) memory and is dropped, so the bucket
    // join emits at most cap² pairs per bucket — never |corpus|×|batch|.
    def buckets(df: DataFrame, as: String) =
      bandedSignatures(df, k, rowsPerBand)
        .groupBy(col("band"), col("bucket"))
        .agg(collectCapped(col("doc_id"), maxBucket).as(as))
        .where(col(as).isNotNull)
    buckets(corpus, "odocs")
      .join(buckets(newBatch, "ndocs"), Seq("band", "bucket"))
      .select(explode(col("odocs")).as("corpus_id"), col("ndocs"))
      .select(col("corpus_id"), explode(col("ndocs")).as("new_id"))
      .distinct()
  }

  /** 60-bit SimHash per document: bit b is set iff the sign sum of
    * token-hash bit b over all token OCCURRENCES is positive (an occurrence
    * contributes ±1, so the sum equals the classic count-weighted form).
    *
    * ZERO shuffles: the signature is a narrow per-row expression
    * ([[graft.functions.SimhashSignature]], whole-stage codegen) over the
    * token array. (The r1 form exploded tokens×60 bit rows through two
    * shuffled groupBys — the slowest query in the round-1 bench; the r2
    * interim form still shuffled the exploded tokens through a 60-column
    * conditional-sum aggregation. SimhashSignatureSpec proves the
    * expression identical to that declarative form.) */
  def simhash(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      graft.functions.SimhashSignature.simhashSignature(tokens(col("text")))
        .as("simhash"))

  /**
   * Near-dup pairs with hamming distance ≤ maxHamming (≤ 3 with the default
   * 4 chunks: pigeonhole guarantees one 15-bit chunk matches exactly, so the
   * chunk-equality join finds every qualifying pair without O(n²)).
   */
  def simhashPairs(corpus: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(corpus)
    val chunks = sig.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk", expr("(simhash >> (15 * c)) & 32767"))
    // merge hint (as in jaccardPairs): both self-join sides shuffle with
    // IDENTICAL subplans, so ReuseExchange computes the signature pipeline
    // once — without it AQE broadcasts one side and the whole scan→explode→
    // 60-sum aggregation runs twice per execution.
    chunks.hint("merge").as("a").join(chunks.hint("merge").as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("bigint").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /**
   * Embedding-cosine near-dup pairs via random-hyperplane LSH (SimHash for
   * vectors, Charikar 2002): plane p's bit is sign(v·p); bands of
   * `bitsPerBand` bits each become blocking buckets, and only same-bucket
   * pairs are ever scored. Identical vectors agree on every sign, so exact
   * duplicates collide in all bands (recall 1 by construction); a pair at
   * angle θ matches one band with (1-θ/π)^bits — the standard S-curve.
   * Every candidate is scored exactly, so blocking affects recall only,
   * never precision.
   *
   * Scale — occupancy-constant sizing (the r6 fix): with a FIXED bucket
   * space the expected candidate count is N²/2^(bits+1) per band —
   * quadratic in corpus size. Measured at the r6 100× sweep: 56 →
   * 642k candidates/band (×11,467 for ×100 rows), the round's only >×16
   * query. So when `bitsPerBand` is 0 (the default) it is sized from the
   * corpus: bits = max(16, ⌈log₂N⌉+1), holding expected bucket occupancy
   * below ~½ at any N — candidate count then grows LINEARLY with the
   * corpus. Widening the bucket space lowers the per-band match
   * probability p^bits, so the band count is re-derived to hold
   * `targetRecall` at `threshold`: bands = ⌈ln(1-R)/ln(1-p^bits)⌉ with
   * p = 1-acos(t)/π. Banding rows grow ~log-linearly (more, narrower
   * bands); candidates stay linear — the 100 TB trade.
   *
   * Bucket groups use [[graft.functions.CollectCapped]] (same primitive as
   * jaccard/minhash): pairs are enumerated IN PLACE from each bucket's
   * sorted id list — no self-join, so the banding pipeline is computed and
   * shuffled ONCE (the r5 form self-joined two full copies through a merge
   * hint) — and a degenerate hot bucket (a mass-duplicated vector) costs
   * O(cap) and is dropped rather than expanding C(m,2); an exact-dup pair
   * in a dropped bucket still surfaces through its other bands unless
   * every band is that hot. Candidates are deduped to bare id pairs
   * BEFORE embeddings join back, keeping wide vectors out of the
   * candidate shuffle. Hyperplanes are seeded driver-side constants and
   * auto-sizing depends only on the corpus count, so the operator is
   * deterministic run-to-run. (The label-blocked variant lives on as IVF:
   * Similarity.ivfTopK.)
   */
  /** Occupancy-constant LSH sizing (pure; unit-tested in DedupSpec):
    * bits = max(16, ⌈log₂n⌉+1) holds expected bucket occupancy ≤ ~½ at
    * any corpus size (fixed bits = quadratic candidate growth); bands =
    * ⌈ln(1-R)/ln(1-p^bits)⌉ with p = 1-acos(t)/π re-derives the band
    * count that still reaches recall R at cosine t after the bucket
    * space widened. Monotone: more rows → more bits → more (narrower)
    * bands; candidates stay linear in n. */
  def lshSizing(n: Long, threshold: Double, targetRecall: Double,
                bitsOverride: Int = 0): (Int, Int) = {
    val bits =
      if (bitsOverride > 0) bitsOverride
      else math.min(30, math.max(16,
        math.ceil(math.log(math.max(n, 2L).toDouble) / math.log(2.0)).toInt + 1))
    val pBit = 1.0 - math.acos(math.min(1.0, threshold)) / math.Pi
    val pBand = math.pow(pBit, bits)
    val bands = math.max(8, math.ceil(
      math.log1p(-targetRecall) / math.log1p(-pBand)).toInt)
    (bits, bands)
  }

  def embeddingPairs(corpus: DataFrame, threshold: Double, nBands: Int = 0,
                     bitsPerBand: Int = 0, dim: Int = 64, seed: Long = 42L,
                     maxBucket: Int = 1024, targetRecall: Double = 0.8): DataFrame = {
    import graft.functions.CollectCapped.collectCapped
    val (bits, autoBands) = lshSizing( // the count job runs only when needed
      if (bitsPerBand > 0) 0L else corpus.count(),
      threshold, targetRecall, bitsPerBand)
    val bands = if (nBands > 0) nBands else autoBands
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(bands * bits)(
      Array.fill(dim)(rng.nextGaussian().toFloat))
    val groups = corpus
      .select(col("vec_id"),
        posexplode(graft.functions.HyperplaneBuckets(
          col("embedding"), planes, bands, bits)).as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket"))
      .agg(collectCapped(col("vec_id"), maxBucket).as("ids"))
      .where(col("ids").isNotNull && size(col("ids")) >= 2)
    // ids is sorted ascending (CollectCapped.eval) and a vec_id appears at
    // most once per (band, bucket), so (ids[i], ids[j]) with i < j
    // enumerates exactly the a < b pairs
    val pairsOf = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))),
        y => struct(x.as("a"), y.as("b")))))
    val cand = groups.select(explode(pairsOf).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
    val emb = corpus.select(col("vec_id"), col("embedding"))
    cand
      .join(emb.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
      .join(emb.select(col("vec_id").as("b"), col("embedding").as("eb")), "b")
      .select(col("a"), col("b"), Similarity.dot(col("ea"), col("eb")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /**
   * SPAN-level duplication profile (r12) — the substring-dedup signal of
   * Lee et al., "Deduplicating Training Data Makes Language Models
   * Better" (ACL'22), at shingle granularity: a document's span is
   * duplicated when the same 5-token shingle appears in ≥ 2 DISTINCT
   * documents, and the per-doc duplicated-span ratio is what a
   * substring-dedup pass thresholds on (doc-level dedup misses a
   * boilerplate header pasted into thousands of otherwise-unique pages;
   * this is the operator that catches it). Returns one row per doc:
   * (doc_id, n_spans, dup_spans, dup_ppm) with dup_ppm an exact
   * integral `dup·10⁶ div n` — no float ratio to drift.
   *
   * Shape: explode to distinct per-doc shingles, hash to the portable
   * 60-bit signature (never the text), ONE groupBy h for the
   * cross-doc-duplicated hash set, one h-keyed left join back, one
   * per-doc fold — every exchanged row is (long, long). At 100 TB the
   * duplicated-hash side is the output of a HAVING over an agg, so the
   * join's build side is only as large as the duplication actually
   * present.
   */
  def spanDupStats(corpus: DataFrame): DataFrame = {
    val sh = corpus.select(col("doc_id"),
        explode(shingles(tokens(col("text")))).as("sh"))
      .select(col("doc_id"),
        graft.functions.Md5HighBits.hash60(col("sh")).as("h"))
    val dup = sh.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2)
      .select(col("h"), lit(1L).as("isdup"))
    sh.join(dup, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
           sum(coalesce(col("isdup"), lit(0L))).as("dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("dup_spans"),
        expr("dup_spans * 1000000 div n_spans").as("dup_ppm"))
  }
}
