package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank's integer-quantized update, pinned against hand-computed
  * exact values — the quantized arithmetic means there is no epsilon
  * anywhere: a single bit of drift is a failure. */
class GraphSpec extends SparkSpec {

  private val Q = Graph.scaleQ

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.pagerank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 2-cycle is a fixpoint: ranks stay exactly 1.0 at any depth") {
    // share = 1e9 div 1; update = 0.15e9 + (85 × 1e9) div 100 = 1e9 exact
    val r = ranks(Seq((1L, 2L), (2L, 1L)), 3)
    assert(r === Map(1L -> Q, 2L -> Q))
  }

  test("symmetric star: hub and leaves land on the hand-computed longs") {
    val edges = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val r = ranks(edges, 1)
    // hub receives 4 whole shares: 0.15e9 + (85 × 4e9) div 100
    assert(r(0L) === 150000000L + 3400000000L)
    // each leaf receives 1e9 div 4: 0.15e9 + (85 × 250e6) div 100
    (1L to 4L).foreach(l => assert(r(l) === 150000000L + 212500000L))
  }

  test("dangling node keeps the floor; its pre-dangling mass drains") {
    // a → b only: b never sends, a never receives
    val r1 = ranks(Seq((10L, 20L)), 1)
    assert(r1(10L) === 150000000L) // receives nothing
    assert(r1(20L) === Q)          // 0.15e9 + 0.85 × 1e9 exactly
    val r2 = ranks(Seq((10L, 20L)), 2)
    assert(r2(10L) === 150000000L)
    // round 2: b receives a's floored rank: 0.15e9 + (85 × 150e6) div 100
    assert(r2(20L) === 150000000L + 127500000L)
  }

  test("multi-edges weight the share like parallel links") {
    // a sends 2 shares to b, 1 to c; outdeg counts multi-edges (3)
    val r = ranks(Seq((1L, 2L), (1L, 2L), (1L, 3L)), 1)
    val share = Q / 3 // 333333333 (div truncates)
    assert(r(2L) === 150000000L + (85L * (2 * share)) / 100)
    assert(r(3L) === 150000000L + (85L * share) / 100)
  }

  test("iters must be positive") {
    import spark.implicits._
    intercept[IllegalArgumentException](
      Graph.pagerank(Seq((1L, 2L)).toDF("src", "dst"), 0))
  }

  private def dists(edges: Seq[(Long, Long)], seeds: Seq[Long],
                    maxHops: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.bfs(edges.toDF("src", "dst"), seeds.toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bfs: first-visit distance wins on a diamond with a shortcut") {
    // 1→2→3→4 plus 1→4: node 4 is dist 1, never 3
    val r = dists(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)), Seq(1L), 3)
    assert(r === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("bfs: maxHops truncates the walk; unreached nodes are absent") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val r = dists(chain, Seq(1L), 2)
    assert(r === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("bfs: exhausted frontier short-circuits before maxHops") {
    val r = dists(Seq((1L, 2L)), Seq(1L), 10)
    assert(r === Map(1L -> 0L, 2L -> 1L))
  }

  test("bfs: multi-source takes the min distance over seeds") {
    // seeds 1 and 5 close in on 3 from both ends of a chain
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
                    (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))
    val r = dists(chain, Seq(1L, 5L), 3)
    assert(r === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("bfs: a cycle never revisits (dist is first-visit, walk halts)") {
    val r = dists(Seq((1L, 2L), (2L, 3L), (3L, 1L)), Seq(1L), 9)
    assert(r === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("standing edge table: built once, probed co-located, results " +
      "bit-match the scratch path (r11)") {
    import spark.implicits._
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
                  (2L, 1L), (3L, 2L), (4L, 3L), (4L, 1L))
    val edges = raw.toDF("src", "dst")
    val tbl = "graft_edges_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    var builds = 0
    val e = Graph.standingEdges({ builds += 1; edges }, spark, tbl, 4)
    // a second resolve must NOT re-derive the edges — build-once is the
    // whole amortization story
    Graph.standingEdges(
      { builds += 1; fail("standing table rebuilt"); edges }, spark, tbl, 4)
    assert(builds === 1)
    // traversals over the standing table bit-match the scratch path
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(Graph.bfsOn(e, Seq(1L).toDF("node"), 3)) ===
      m(Graph.bfs(edges, Seq(1L).toDF("node"), 3)))
    assert(m(Graph.pagerankOn(e, 3)) === m(Graph.pagerank(edges, 3)))
    // the plan pin: with broadcast off, a frontier probe exchanges ONLY
    // the frontier side — the bucketed edge scan's partitioning IS the
    // join distribution (no Exchange, no re-Sort of |E| per hop)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = e.join(Seq(1L, 2L).toDF("src"), "src")
      probe.collect()
      // AQE's toString prints Final AND Initial plans — audit the final
      val plan = probe.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("Exchange hashpartitioning\\(src".r.findAllIn(plan).size === 1,
        s"expected only the frontier-side exchange:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"edge side must read its bucket layout:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
