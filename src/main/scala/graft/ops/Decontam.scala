package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: find (and drop) training documents that share
 * word-n-gram shingles with a held-out evaluation set — the train/test
 * overlap removal every serious LLM training corpus runs (the published
 * recipe: n-gram collision against each benchmark, then document removal).
 *
 * Scale shape: the benchmark side is SMALL by definition (eval sets are
 * thousands of documents against a 100 TB corpus), so its distinct shingle
 * set is computed once and BROADCAST; the training corpus then streams
 * through one scan → explode(distinct shingles) → broadcast hash semi-join
 * → groupBy(doc_id). No shuffle ever carries corpus text: the only shuffled
 * rows are (doc_id, hit-count) partial aggregates for contaminated docs —
 * a vanishing fraction of the corpus. Shingling reuses [[TextOps.shingles]]
 * (distinct within doc), so `n_hits` = number of DISTINCT contaminated
 * n-grams per doc, a stable severity measure.
 */
object Decontam {

  /**
   * (doc_id, n_hits) for every training doc sharing ≥1 distinct n-gram with
   * `bench`. `train`/`bench`: (doc_id, text).
   *
   * `broadcastBench = true` (default) asserts the precondition that the
   * benchmark is FIXED-SIZE (real eval suites are thousands of docs
   * regardless of corpus scale) — its gram set must fit a broadcast. If
   * the "benchmark" is instead corpus-proportional (as a test fixture
   * slice is), pass false and the planner picks a shuffle join from
   * stats; the operator stays correct, only the no-text-shuffle guarantee
   * weakens to the gram-hash shuffle.
   */
  def contaminated(train: DataFrame, bench: DataFrame, n: Int = 5,
                   broadcastBench: Boolean = true): DataFrame = {
    // Join on the 60-bit md5 gram hash, not the raw string: the broadcast
    // set becomes fixed-width longs (8B vs ~40B keys — smaller build side,
    // cheaper probes against the corpus-side billions of grams), and the
    // semantics stay engine-deterministic because the oracle computes the
    // SAME hash (the dedup_ngram_jaccard precedent; a cross-engine-stable
    // hash is exactly what md5 is here for).
    def grams(df: DataFrame) = df.select(col("doc_id"),
      explode(TextOps.shingles(TextOps.tokens(col("text")), n)).as("g"))
    val benchGrams = grams(bench)
      .select(TextOps.tokenHash(col("g")).as("gh")).distinct()
    grams(train)
      .select(col("doc_id"), TextOps.tokenHash(col("g")).as("gh"))
      .join(if (broadcastBench) broadcast(benchGrams) else benchGrams, "gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The clean corpus: training docs with zero benchmark overlap. */
  def decontaminate(train: DataFrame, bench: DataFrame, n: Int = 5): DataFrame =
    train.join(contaminated(train, bench, n).select(col("doc_id")),
      Seq("doc_id"), "left_anti")
}
