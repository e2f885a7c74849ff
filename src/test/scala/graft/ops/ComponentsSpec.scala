package graft.ops

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comp(pairs: (Long, Long)*): Map[Long, Long] =
    Components.components(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain converges to its minimum id (diameter > 1 rounds)") {
    // 7-5-3-1 chain plus separate 2-4: two components
    assert(comp((7L, 5L), (5L, 3L), (3L, 1L), (2L, 4L)) ===
      Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 7L -> 1L, 2L -> 2L, 4L -> 2L))
  }

  test("cliques and bridges merge into one component") {
    assert(comp((10L, 11L), (11L, 12L), (20L, 21L), (12L, 20L)) ===
      Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 10L, 21L -> 10L))
  }
}
