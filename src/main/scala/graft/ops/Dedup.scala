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
 *   - exact:    group by md5(text)
 *   - jaccard:  shared-shingle candidate join, then exact Jaccard verify
 *   - minhash:  K-member md5 hash family → bands → bucket join (LSH)
 *   - simhash:  60-bit sign-aggregated token hash → 15-bit chunk join
 *               (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 of 4 chunks equal)
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

  private def docShingles(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      explode(shingles(tokens(col("text")))).as("sh"))

  /**
   * N-gram Jaccard near-dup pairs. Candidate generation is the shingle
   * join itself (blocking key = shingle): only pairs sharing ≥1 shingle are
   * ever materialized, and the per-pair intersection count falls out of the
   * same join — one shuffle on shingle, one on the pair.
   */
  def jaccardPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val sh = docShingles(corpus)
    // set sizes come from the exploded shingle rows (distinct already), so
    // the shingle expression is NOT re-evaluated per consumer; and the
    // merge hint forces identical shuffle subplans on both self-join sides,
    // which ReuseExchange computes once.
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    sh.hint("merge").as("a").join(sh.hint("merge").as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
      .withColumn("jac", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jac") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"), col("jac"))
  }

  /**
   * MinHash signatures (K members of the md5 hash family, min over
   * shingles) banded into K/rowsPerBand LSH buckets; pairs sharing any
   * bucket are near-dup candidates. Probability a pair with Jaccard j
   * collides: 1-(1-j^r)^b — the standard S-curve.
   */
  def minhashCandidates(corpus: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val sh = docShingles(corpus)
    val sig = sh.groupBy(col("doc_id")).agg(
      min(hashMember(0, col("sh"))).as("mh0"),
      (1 until k).map(i => min(hashMember(i, col("sh"))).as(s"mh$i")): _*)
    val bands = (0 until k / rowsPerBand).map { j =>
      val members = (0 until rowsPerBand).map(r => col(s"mh${j * rowsPerBand + r}"))
      struct(lit(j).as("band"), concat_ws("_", members: _*).as("bucket"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .distinct()
  }

  /** 60-bit SimHash per document: bit b is set iff the count-weighted sign
    * sum of token-hash bit b is positive. Pure column algebra — the 60-way
    * bit explode stays inside whole-stage codegen. */
  def simhash(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("w"))
      .withColumn("h", tokenHash(col("tok")))
      .select(col("doc_id"), col("w"), col("h"),
        explode(sequence(lit(0), lit(59))).as("b"))
      .withColumn("contrib",
        when(expr("(h & shiftleft(CAST(1 AS BIGINT), b)) != 0"), col("w"))
          .otherwise(-col("w")))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("contrib")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(lit(0L))).as("simhash"))

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
    chunks.as("a").join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs, blocked by an existing coarse label
    * (IVF-style): only same-bucket pairs are scored. Vectors are
    * unit-normalized so the dot product IS the cosine. */
  def embeddingPairs(corpus: DataFrame, threshold: Double): DataFrame =
    corpus.as("a").join(corpus.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"),
        Similarity.dot(col("a.embedding"), col("b.embedding")).as("cos"))
      .where(col("cos") >= threshold)
}
