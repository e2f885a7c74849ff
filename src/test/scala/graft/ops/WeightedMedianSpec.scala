package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The one-scan bracket weighted median, pinned against a brute-force
  * replay — exact longs end to end, so every comparison is equality,
  * no epsilon. The operator's contract is "exact for ANY sample": the
  * suite drives the hit path, the sentinel-miss retry (a sample that
  * deliberately lies), and the group-absent-from-sample fallback. */
class WeightedMedianSpec extends SparkSpec {

  import spark.implicits._

  /** Brute force: the smallest v whose cumulative weight (in v order,
    * equal values combined) reaches ⌈W/2⌉. */
  private def oracle(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tw = byV.map(_._2).sum
      val t = (tw + 1) / 2
      var cum = 0L
      val v = byV.find { case (_, w) => cum += w; cum >= t }.get._1
      g -> (v, tw)
    }

  private def run(full: Seq[(String, Long, Long)],
                  sample: Seq[(String, Long, Long)],
                  width: Long = 16L, margin: Int = 10): Map[String, (Long, Long)] =
    WeightedMedian.perGroup(
        full.toDF("g", "v", "w"), sample.toDF("g", "v", "w"),
        bucketWidth = width, marginPct = margin)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def randRows(seed: Long, n: Int, groups: Int): Seq[(String, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      (s"g${rnd.nextInt(groups)}", rnd.nextInt(1000).toLong,
        1L + rnd.nextInt(50))
    }
  }

  test("representative sample: exact answer, no retry scan") {
    val full = randRows(7L, 5000, 3)
    // an honest sample: every 10th row — close enough for a ±10% margin
    val sample = full.zipWithIndex.collect { case (r, i) if i % 10 == 0 => r }
    assert(run(full, sample) === oracle(full))
  }

  test("adversarial sample still yields the exact answer via the retry") {
    val full = randRows(11L, 3000, 2)
    // the sample LIES: all its mass sits far above every real value, so
    // the bracket lands in empty territory and the crossing row is the
    // BELOW sentinel for every group — forcing the full-range retry
    val sample = Seq(("g0", 100000L, 5L), ("g1", 100000L, 5L))
    assert(run(full, sample) === oracle(full))
  }

  test("group absent from the sample passes through unclamped (exact)") {
    val full = randRows(13L, 2000, 2) ++
      Seq(("ghost", 42L, 3L), ("ghost", 7L, 1L), ("ghost", 42L, 2L))
    val sample = full.filter(_._1 != "ghost").take(200)
    val r = run(full, sample)
    assert(r === oracle(full))
    assert(r("ghost") === (42L, 6L)) // t=⌈6/2⌉=3: cum(7)=1, cum(42)=6
  }

  test("all weight on one value; threshold exactly at a bucket edge") {
    val full = Seq(("a", 32L, 9L), // single value = the median trivially
      // b: values 15|16 straddle the width-16 bucket boundary with
      // equal weight — t = 3 lands exactly on 15's cumulative, so the
      // LOWER value is the weighted median (the ≥ crossing rule)
      ("b", 15L, 3L), ("b", 16L, 3L))
    val r = run(full, full)
    assert(r === Map("a" -> (32L, 9L), "b" -> (15L, 6L)))
    assert(r === oracle(full))
  }

  test("tight margin + skewed tail: miss detected on the ABOVE side") {
    // sample covers only the low half, margin minimal; the heavy true
    // median sits above the bracket's high edge
    val full = (1 to 100).map(i => ("s", i.toLong, 1L)) ++
      Seq(("s", 900L, 200L)) // true median = 900
    val sample = (1 to 100).map(i => ("s", i.toLong, 1L))
    val r = run(full, sample, width = 4L, margin = 1)
    assert(r === oracle(full))
    assert(r("s")._1 === 900L)
  }

  test("wildly disjoint group ranges take the per-group join clamp, exact") {
    // g0 ~ [0, 1000), g1 ~ [1e12, 1e12+1000): the global bracket span
    // would cover every value between them, so the spread guard flips
    // to the per-group broadcast-join clamp — same exact answer
    val rnd = new scala.util.Random(23L)
    val full = (1 to 2000).map { _ =>
      if (rnd.nextBoolean()) ("g0", rnd.nextInt(1000).toLong, 1L + rnd.nextInt(9))
      else ("g1", 1000000000000L + rnd.nextInt(1000), 1L + rnd.nextInt(9))
    }
    val sample = full.zipWithIndex.collect { case (r, i) if i % 5 == 0 => r }
    assert(run(full, sample) === oracle(full))
  }

  test("determinism: repeated evaluation is bit-identical") {
    val full = randRows(17L, 4000, 4)
    val sample = full.take(400)
    val a = run(full, sample)
    (1 to 3).foreach(_ => assert(run(full, sample) === a))
  }
}
