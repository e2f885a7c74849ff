package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CollectCapped.collectCapped

class CollectCappedSpec extends SparkSpec {
  import spark.implicits._

  test("groups at or under the cap collect sorted; hot groups eval to null") {
    // key 1: 3 members (≤ cap), key 2: 5 members (> cap)
    val df = Seq((1L, 30L), (1L, 10L), (1L, 20L),
                 (2L, 5L), (2L, 4L), (2L, 3L), (2L, 2L), (2L, 1L))
      .toDF("k", "v")
      .repartition(4) // members spread over partitions → real merges
      .groupBy($"k").agg(collectCapped($"v", 4).as("vs"))
    val rows = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L) === Some(Seq(10L, 20L, 30L)))
    assert(rows(2L) === None)
  }

  test("cap boundary: exactly cap members survive") {
    val df = (1L to 4L).map(v => (1L, v)).toDF("k", "v")
      .groupBy($"k").agg(collectCapped($"v", 4).as("vs"))
    assert(df.collect().head.getSeq[Long](1) === Seq(1L, 2L, 3L, 4L))
  }

  test("merge saturates: partial buffers never grow past cap+1") {
    val agg = CollectCapped(
      org.apache.spark.sql.graft.Bridge.expression(lit(0L)), cap = 4)
    val big = ArrayBuffer[Long](1, 2, 3, 4, 5) // already saturated
    val merged = agg.merge(big, ArrayBuffer[Long](6, 7, 8, 9, 10))
    assert(merged.length === 5) // cap+1, not 10
    assert(agg.eval(merged) === null)
    // round-trips through the shuffle serialization unchanged
    assert(agg.deserialize(agg.serialize(merged)) === merged)
  }

  test("null inputs are skipped, not collected") {
    val df = Seq((1L, Some(2L)), (1L, None), (1L, Some(1L)))
      .toDF("k", "v")
      .groupBy($"k").agg(collectCapped($"v", 4).as("vs"))
    assert(df.collect().head.getSeq[Long](1) === Seq(1L, 2L))
  }
}
