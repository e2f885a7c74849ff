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
    for ((beam, hops) <- Seq((5, 3), (8, 3), (16, 4))) {
      val rLow = recall(graft.ops.KnnGraph.beamSearch(
        corpus, adj, queries, k, beam, hops, entries = 4))
      val rDeg = recall(graft.ops.KnnGraph.beamSearch(
        corpus, adj, queries, k, beam, hops, entries = 4,
        seedsOverride = Some(degSeeds)))
      println(f"SEEDS beam=$beam%-2d hops=$hops  " +
        f"lowestId=$rLow%.3f  degreeRanked=$rDeg%.3f")
    }
    spark.stop()
  }
}
