package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyword retrieval + rank fusion — the lexical half of a production
 * search stack (the vector half is [[Similarity]]; [[rrfFuse]] welds
 * the two into hybrid search). Reference capability: the corpus-query
 * surface of Lineage-Store's query.py (select/sum over chosen columns)
 * has no ranking story at all; this is the retrieval layer a training-
 * data engine actually needs (mining documents for a topic, dedup-aware
 * retrieval, benchmark mining).
 *
 * Determinism contract (the repo-wide oracle discipline): BM25's idf is
 * the LOG-FREE odds form (N - df + ½)/(df + ½) — monotone in the
 * classic Robertson idf, so per-term orderings agree, but free of libm
 * `ln` whose final-ulp rounding the two engines don't share. Every
 * remaining operation is IEEE-754 +,×,/ (correctly rounded, engine-
 * independent) evaluated in one pinned association order, and each
 * per-term contribution quantizes to floor(x·10⁶) longs BEFORE the
 * per-doc sum — longs add associatively, so the 32-partition aggregate
 * hash-matches a single-node replay bit for bit.
 */
object Retrieval {

  /**
   * BM25 scores over `docs(doc_id, text)` for a literal term set (the
   * query). k1 = 1.2, b = 0.75 (the Robertson defaults, exact-enough
   * literals: both engines parse them to identical doubles).
   *
   * Shape at 100 TB: ONE corpus scan produces (term, dl) pairs map-side
   * (the doc-length ride along the explode, so there is no second scan
   * to re-measure documents); `terms` filters BEFORE the tf shuffle, so
   * only query-term postings ever exchange — the shuffle is O(docs
   * containing a query term), not O(tokens). The df and global-stats
   * sides are |terms|-row and 1-row aggregates, broadcast back; the
   * final per-doc sum is a map-side-combined groupBy on doc_id.
   * Returns (doc_id, score_q) for every doc matching ≥1 term.
   */
  def bm25(docs: DataFrame, terms: Seq[String],
           scale: Long = 1000000L): DataFrame = {
    require(terms.nonEmpty, "bm25: empty term set")
    val base = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
    // dl rides the explode: one projection yields every (doc, term, dl)
    val toks = base.select(col("doc_id"),
      size(col("tk")).cast("long").as("dl"), explode(col("tk")).as("term"))
    val hits = toks.where(col("term").isin(terms: _*))
    val tf = hits.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = hits.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n"),
      (sum(size(col("tk")).cast("long")).cast("double") /
        count(lit(1))).as("avgdl"))
    // association order pinned to match the DuckDB oracle text exactly
    val idf = (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val sat = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(idf * sat * lit(scale.toDouble)).cast("long").as("cq"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cq")).as("score_q"))
  }

  /** Global top-k with a dense rank column, WITHOUT a global sort or a
    * single-reducer window: `orderBy().limit(k)` plans as
    * TakeOrderedAndProject (per-partition heap top-k, driver merge of k
    * rows per partition), then the rank window runs over the k
    * surviving rows only. `orderCols` must make the order total. */
  def topKRanked(df: DataFrame, k: Int, orderCols: Column*): DataFrame = {
    val top = df.orderBy(orderCols: _*).limit(k)
    top.withColumn("rnk",
      row_number().over(Window.orderBy(orderCols: _*)).cast("long"))
  }

  /** BM25 top-k: (doc_id, score_q, rnk), rnk 1..k, ties doc_id-asc. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame =
    topKRanked(bm25(docs, terms), k, col("score_q").desc, col("doc_id").asc)

  /**
   * Reciprocal-rank fusion (Cormack et al.): fuse two ranked lists on
   * doc_id by Σ 1/(c + rank), missing-from-a-list contributing 0. The
   * standard hybrid-search combiner — rank-space fusion needs no score
   * calibration between BM25's term space and the dot-product's vector
   * space. Inputs are top-k lists (driver-small by construction), so
   * the fuse is a broadcast-size full outer join; determinism is two
   * correctly-rounded divisions and one add, then total-order ranking.
   */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    val l = a.select(col("doc_id").as("a_id"), col("rnk").as("ra"))
    val r = b.select(col("doc_id").as("b_id"), col("rnk").as("rb"))
    val fused = l.join(r, col("a_id") === col("b_id"), "full_outer")
      .select(coalesce(col("a_id"), col("b_id")).as("doc_id"),
        (coalesce(lit(1.0) / (lit(c.toLong) + col("ra")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(c.toLong) + col("rb")), lit(0.0))).as("rrf"))
    topKRanked(fused, k, col("rrf").desc, col("doc_id").asc)
  }
}
