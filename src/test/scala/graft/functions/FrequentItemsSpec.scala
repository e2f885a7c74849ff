package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Misra–Gries heavy-hitter sketch (functions/FrequentItems): the
  * guarantee — every item with true frequency above n/k is present —
  * must hold under every partitioning (merge trees reorder freely). */
class FrequentItemsSpec extends SparkSpec {

  import spark.implicits._

  private def candidates(items: Seq[String], k: Int, parts: Int): Set[String] =
    items.toDF("item").repartition(parts)
      .agg(FrequentItems.freqItems(col("item"), k).as("c"))
      .head().getSeq[String](0).toSet

  test("every item above n/k survives, across partitionings") {
    val rnd = new scala.util.Random(7)
    // 3 hot items at ~20% each, noise singletons for the rest
    val hot = Seq.fill(600)(s"hot_${rnd.nextInt(3)}")
    val cold = (0 until 1200).map(i => s"cold_$i")
    val items = rnd.shuffle(hot ++ cold)
    val n = items.size
    val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong)
    for (k <- Seq(8, 16, 64); parts <- Seq(1, 3, 16)) {
      val cand = candidates(items, k, parts)
      assert(cand.size <= k)
      val mustSurvive = trueCounts.filter(_._2 > n.toLong / k).keySet
      assert(mustSurvive.subsetOf(cand),
        s"k=$k parts=$parts lost ${mustSurvive -- cand}")
    }
  }

  test("low-cardinality input is exact: all items present, count-ordered first") {
    val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val cand = items.toDF("item").repartition(2)
      .agg(FrequentItems.freqItems(col("item"), 16).as("c"))
      .head().getSeq[String](0)
    // under capacity no counter is ever debited: the summary is exact
    assert(cand.toSet === Set("a", "b", "c"))
    assert(cand.head === "a", "presentation order is count-descending")
  }

  test("nulls are ignored; empty input yields an empty summary") {
    val cand = Seq(Some("x"), None, Some("x"), None).toDF("item")
      .agg(FrequentItems.freqItems(col("item"), 4).as("c"))
      .head().getSeq[String](0)
    assert(cand === Seq("x"))
    val empty = Seq.empty[String].toDF("item")
      .agg(FrequentItems.freqItems(col("item"), 4).as("c"))
      .head().getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("streaming: the sketch merges across micro-batches, guarantee holds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fi_stream_").toString
    // 3 files → maxFilesPerTrigger=1 forces 3 micro-batches; 'hot' is
    // above n/k ONLY across the whole stream, so it must survive the
    // cross-batch state merge, not any single batch
    Seq(Seq.fill(8)("hot") ++ (1 to 20).map(i => s"a_$i"),
        (21 to 45).map(i => s"b_$i").toSeq,
        Seq.fill(8)("hot") ++ (46 to 65).map(i => s"c_$i"))
      .foreach(items => items.toDF("item").coalesce(1)
        .write.mode("append").parquet(dir))
    val stream = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("item", org.apache.spark.sql.types.StringType))
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val cand = graft.streaming.StreamOps.drainComplete(spark,
        stream.agg(FrequentItems.freqItems(col("item"), 8).as("c")))
      .head().getSeq[String](0)
    // n=81, n/k≈10, count(hot)=16 > n/k → MG + the mergeable merge
    // guarantee hot survives any batch split
    assert(cand.contains("hot"), s"hot item lost across batches: $cand")
    assert(cand.size <= 8)
  }

  test("grouped sketches stay per-group (buffer isolation + serialization)") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"),
                 ("g2", "z"), ("g2", "z"), ("g2", "z")).toDF("g", "item")
    val byGroup = df.repartition(4).groupBy("g")
      .agg(FrequentItems.freqItems(col("item"), 4).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(byGroup("g1") === Set("a", "b"))
    assert(byGroup("g2") === Set("z"))
  }
}
