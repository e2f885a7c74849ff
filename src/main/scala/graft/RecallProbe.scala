package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/**
 * Measurement harness for the IVF coarse quantizer (SURVEY §5 evidence):
 * recall@k of the seeded vs Lloyd-trained centroid sets against the
 * brute-force truth at equal probe cost, plus bucket-occupancy skew
 * (max/mean bucket size — the hot-bucket factor a probe pays at scale).
 *
 * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.RecallProbe
 */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-recall")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nQ = 25
    val k = 10
    val queries = corpus.where(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val truth = Similarity.bruteTopK(corpus, queries, k)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("qid"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    }
    def skew(cents: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val sizes = Similarity.assignToCentroids(corpus, cents, "vec_id")
        .groupBy(col("cid")).count().collect().map(_.getLong(1))
      (sizes.max, sizes.max.toDouble / (sizes.sum.toDouble / sizes.length))
    }

    for (c <- Seq(16, 64)) {
      val (sMax, sSkew) = skew(Similarity.seedCentroids(corpus, c))
      val (tMax, tSkew) = skew(Similarity.trainedCentroids(corpus, c, 2))
      for (p <- Seq(1, 2)) {
        val rs = recall(Similarity.ivfBuildProbe(corpus, queries, k, c, p))
        val rt = recall(Similarity.ivfBuildProbe(corpus, queries, k, c, p,
          trainIters = 2))
        println(f"RECALL c=$c%-3d nProbe=$p  seeded=$rs%.3f  trained=$rt%.3f")
      }
      println(f"SKEW   c=$c%-3d maxBucket seeded=$sMax (x$sSkew%.1f of mean)  " +
        f"trained=$tMax (x$tSkew%.1f of mean)")
    }

    // kNN-graph entry-point strategies (r13): lowest-id vs degree-ranked
    // seeds at EQUAL beam/hops budget over the same stored graph — the
    // evidence behind createKnnIndex persisting `_knn/seeds`
    val graph = graft.ops.KnnGraph
      .nnDescent(corpus, 5, 3, descentK = 15).localCheckpoint()
    val adj = graft.ops.KnnGraph.symmetrize(graph).localCheckpoint()
    import spark.implicits._
    val degSeeds = adj.groupBy(col("p").as("vec_id"))
      .agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("vec_id").asc).limit(64)
      .select(col("vec_id")).collect().map(_.getLong(0))
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }.toSeq
      .toDF("vec_id", "rnk")
    // per-query centroid-nearest seeds (r14, the `_knn/seeds` serving
    // path): route each query to its nearest trained centroid, start at
    // that centroid's 4 lowest-id members — query-DEPENDENT entry
    // points at the SAME beam/hops budget as the global strategies
    val segCents = Similarity.trainedCentroids(corpus, 16, iters = 1)
    val segCs = Similarity.collectCentroids(segCents)
    val wm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("vec_id").asc)
    val members = Similarity.assignWith(corpus, segCs)
      .withColumn("rnk", row_number().over(wm)).where(col("rnk") <= 4)
      .select(col("cid"), col("vec_id")).localCheckpoint()
    val perQ = Similarity.assignWith(
        queries.select(col("qid"), col("qe").as("embedding")), segCs)
      .select(col("qid"), col("cid"))
      .join(members, Seq("cid")).select(col("qid"), col("vec_id"))
    for ((beam, hops) <- Seq((5, 3), (8, 3), (16, 4))) {
      val rLow = recall(graft.ops.KnnGraph.beamSearch(
        corpus, adj, queries, k, beam, hops, entries = 4))
      val rDeg = recall(graft.ops.KnnGraph.beamSearch(
        corpus, adj, queries, k, beam, hops, entries = 4,
        seedsOverride = Some(degSeeds)))
      val rCent = recall(graft.ops.KnnGraph.beamSearch(
        corpus, adj, queries, k, beam, hops, entries = 4,
        perQuerySeeds = Some(perQ)))
      println(f"SEEDS beam=$beam%-2d hops=$hops  " +
        f"lowestId=$rLow%.3f  degreeRanked=$rDeg%.3f  " +
        f"centroidPerQuery=$rCent%.3f")
    }
    // seed-richness variants at the beam16/hops4 budget: more members
    // per centroid and 2-probe routing (the two knobs the `_knn/seeds`
    // sidecar already stores the data for)
    def perQVar(nMembers: Int, nProbe: Int) = {
      val mem = Similarity.assignWith(corpus, segCs)
        .withColumn("rnk", row_number().over(wm))
        .where(col("rnk") <= nMembers)
        .select(col("cid"), col("vec_id"))
      Similarity.probeCentroids(
          queries.select(col("qid"), col("qe").as("embedding")),
          segCents, "qid", nProbe)
        .select(col("qid"), col("cid"))
        .join(mem, Seq("cid")).select(col("qid"), col("vec_id"))
    }
    for ((m, p) <- Seq((8, 1), (16, 1), (8, 2), (16, 2))) {
      val r = recall(graft.ops.KnnGraph.beamSearch(
        corpus, adj, queries, k, 16, 4, entries = 4,
        perQuerySeeds = Some(perQVar(m, p))))
      println(f"SEEDVAR beam=16 hops=4 members=$m%-2d nProbe=$p  " +
        f"recall=$r%.3f")
    }
    // graph DENSITY: keep the full descentK=15 lists instead of trimming
    // to 5 — the stored `_knn` graph is the other recall lever (the
    // descent already paid for these edges; trimming throws them away)
    val graph15 = graft.ops.KnnGraph
      .nnDescent(corpus, 15, 3, descentK = 15).localCheckpoint()
    val adj15 = graft.ops.KnnGraph.symmetrize(graph15).localCheckpoint()
    for ((beam, hops) <- Seq((5, 3), (16, 4))) {
      val rLo = recall(graft.ops.KnnGraph.beamSearch(
        corpus, adj15, queries, k, beam, hops, entries = 4))
      val rC = recall(graft.ops.KnnGraph.beamSearch(
        corpus, adj15, queries, k, beam, hops, entries = 4,
        perQuerySeeds = Some(perQVar(8, 1))))
      println(f"DENSE15 beam=$beam%-2d hops=$hops  lowestId=$rLo%.3f  " +
        f"centroidPerQuery(m8,p1)=$rC%.3f")
    }
    for ((m, p) <- Seq((16, 1), (8, 2), (16, 2))) {
      val r = recall(graft.ops.KnnGraph.beamSearch(
        corpus, adj15, queries, k, 16, 4, entries = 4,
        perQuerySeeds = Some(perQVar(m, p))))
      println(f"DENSEVAR beam=16 hops=4 members=$m%-2d nProbe=$p  " +
        f"recall=$r%.3f")
    }
    spark.stop()
  }
}
