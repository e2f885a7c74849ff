package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.PipelineQueries

/** Semantic invariants for the round-4 pipeline operators: sequence
  * packing (concat-and-chunk prefix sums) and benchmark decontamination
  * (n-gram overlap vs a held-out set), plus plan-shape assertions that
  * the scale claims hold (no global single-reducer window; benchmark
  * side broadcast). */
class PackingDecontamSpec extends SparkSpec {

  private def run(name: String) = PipelineQueries.queries(name)(spark, sfDir)

  test("pipe_pack start offsets are the exclusive prefix sum in doc order") {
    val rows = run("pipe_pack")
      .select("doc_id", "n_tokens", "start_tok", "pack_id", "n_packs")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { case (id, n, start, pack, nPacks) =>
      assert(start == cum, s"doc $id: start $start != cumulative $cum")
      assert(pack == start / 2048, s"doc $id: wrong pack id")
      assert(nPacks == (start + n - 1) / 2048 - start / 2048 + 1,
        s"doc $id: wrong span")
      cum += n
    }
    // packing is gapless and complete: total tokens == last start + last n
    assert(cum == rows.last._3 + rows.last._2)
  }

  test("pipe_pack plans the parallel prefix-sum, not a global window") {
    val qe = run("pipe_pack").queryExecution
    // inspect the OPTIMIZED plan's window nodes directly: a partition spec
    // emptied by the optimizer (the foldable-lit(0) trap) or a naive
    // global cumsum would leave partitionSpec empty — the single-reducer
    // plan this operator exists to avoid
    val wins = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty, "expected window nodes in the pack plan")
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned (single-reducer) window in pack plan: $w")
    }
    val plan = qe.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "offset histogram should broadcast back")
  }

  test("decontamination flags exactly the docs sharing 5-grams with the benchmark") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val bench = docs.where(col("doc_id") % 97 === 0)
    val train = docs.where(col("doc_id") % 97 =!= 0)
    val flagged = Decontam.contaminated(train, bench, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent local oracle: shingle sets via plain Scala
    def grams(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 5) Set(toks.mkString(" "))
      else toks.sliding(5).map(_.mkString(" ")).toSet
    }
    val benchGrams = bench.collect().flatMap(r => grams(r.getString(1))).toSet
    val expected = train.collect()
      .map(r => r.getLong(0) -> grams(r.getString(1)).count(benchGrams))
      .filter(_._2 > 0).toMap
    assert(flagged == expected)
    // a benchmark doc's own text always collides with itself — sanity that
    // the planted overlap exists whenever an exact duplicate of a benchmark
    // doc appears in train (none in raw documents, so just non-degeneracy):
    assert(expected.isEmpty == flagged.isEmpty)
  }

  test("decontaminate drops flagged docs and keeps everything else") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val bench = docs.where(col("doc_id") % 97 === 0)
    val train = docs.where(col("doc_id") % 97 =!= 0)
    val flagged = Decontam.contaminated(train, bench).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val kept = Decontam.decontaminate(train, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = train.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- flagged)
  }

  test("emb_quantize error is bounded by scale/2 and zero for exact multiples") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val rows = Quantize.int8(emb, "vec_id", "embedding")
      .select("vec_id", "scale", "err_max").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, err) = (r.getDouble(1), r.getDouble(2))
      // |x - q·scale| ≤ scale/2 by construction (+1 ulp of slack)
      assert(err <= scale / 2 * (1 + 1e-12),
        s"vec ${r.getLong(0)}: err $err > half-step ${scale / 2}")
    }
    // a vector that is already an exact int8 grid reconstructs exactly
    import spark.implicits._
    val grid = Seq((1L, Array(127.0f, -127.0f, 0.0f))).toDF("vec_id", "embedding")
    val g = Quantize.int8(grid, "vec_id", "embedding").collect().head
    assert(g.getDouble(g.fieldIndex("err_max")) == 0.0)
    assert(g.getDouble(g.fieldIndex("scale")) == 1.0)
  }

  test("emb_quantize is a shuffle-free map over the scan") {
    val plan = PipelineQueries.queries("emb_quantize")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "quantization must not shuffle")
  }

  test("incremental dedup finds every planted copy and only cross-side pairs") {
    val pairs = run("dedup_incremental").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exact copies have identical minhash signatures → collide in EVERY
    // band → recall 1 by construction
    val docIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 10 == 0)
    assert(docIds.nonEmpty)
    docIds.foreach { id =>
      assert(pairs.contains((id, id + 100000L)),
        s"missing cross-corpus pair for planted copy of doc $id")
    }
    // strictly cross-side: corpus ids left, new-batch ids right
    assert(pairs.forall { case (c, n) => c < 100000L && n >= 100000L })
  }

  test("decontamination broadcasts the benchmark gram set") {
    val plan = run("pipe_decontaminate").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "benchmark side must broadcast — shuffling corpus text is the anti-plan")
  }
}
