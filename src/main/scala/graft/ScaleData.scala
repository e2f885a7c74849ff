package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-up data generator: replicate an sf directory `factor`× with
 * id-offset arithmetic that preserves every invariant the queries rely on
 * (unique primary keys, orders↔lineitem foreign keys shifted together,
 * per-user event density, doc_id < 100000-per-replica headroom for the
 * planted-dup corpus). Dimensions (region/nation/customer/supplier/part)
 * are copied once — exactly how a real fact-vs-dim warehouse scales.
 *
 * Usage: runMain graft.ScaleData <srcSfDir> <outDir> <factor>
 * The output dir serves as a drop-in SPARK_GRAFT_SF_DIR for Bench — the
 * evidence behind "would this plan survive 100×" is a measured run, not
 * a guess (see SURVEY.md §5a).
 */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def table(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** Union `factor` shifted copies; `shifts` maps column → per-replica
      * stride; `mutate` diversifies content per replica index. */
    def replicate(df: DataFrame, shifts: Map[String, Long],
                  mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
      val replicas = (0 until factor).map { i =>
        mutate(shifts.foldLeft(df) { case (d, (c, stride)) =>
          d.withColumn(c, col(c) + lit(i * stride))
        }, i)
      }
      replicas.reduce(_ unionByName _)
    }

    // Content diversification — without it every document/vector has
    // `factor` exact copies, and the near-dup operators' TRUE answer (all
    // C(copies,2) pairs) is quadratic in the factor: the first 100× run
    // measured output explosion, not plan scaling. A per-replica alphabet
    // rotation destroys shingle/token overlap across rotation classes
    // (dup-group size drops from `factor` to ceil(factor/25)); a circular
    // embedding shift preserves the norm but breaks cosine alignment.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rotText(d: DataFrame, i: Int): DataFrame =
      if (i % 25 == 0) d
      else {
        val r = i % 25
        d.withColumn("text", translate(col("text"), alpha, alpha.drop(r) + alpha.take(r)))
      }
    def rotVec(d: DataFrame, i: Int): DataFrame =
      if (i % 63 == 0) d
      else {
        val r = i % 63
        d.withColumn("embedding",
          concat(slice(col("embedding"), r + 1, 100000), slice(col("embedding"), 1, r)))
      }

    // strides: clear of each source table's max id so replicas never
    // collide. documents/embeddings stride 300k: the planted-dup fixtures
    // add +100000/+200000 to ids, so replica i's plants land in
    // [i·300k+100k, i·300k+205k+n) — disjoint from every replica's real id
    // range [j·300k, j·300k+n) for any source n < 95k.
    val orderStride = 10_000_000L // sf0.1 max o_orderkey = 600_000
    val custStride = 1_000_000L
    val userStride = 1_000_000L
    val docStride = 300_000L
    val nEvents = table("events").count()

    val jobs = Seq(
      ("orders", replicate(table("orders"),
        Map("o_orderkey" -> orderStride, "o_custkey" -> custStride))),
      ("lineitem", replicate(table("lineitem"),
        Map("l_orderkey" -> orderStride))),
      ("customer", replicate(table("customer"), Map("c_custkey" -> custStride))),
      ("events", replicate(table("events"),
        Map("event_id" -> nEvents, "user_id" -> userStride))),
      ("documents", replicate(table("documents"), Map("doc_id" -> docStride), rotText)),
      ("embeddings", replicate(table("embeddings"), Map("vec_id" -> docStride), rotVec)),
      ("region", table("region")),
      ("nation", table("nation")),
      ("supplier", table("supplier")),
      ("part", table("part")))

    jobs.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] $name written")
    }
    spark.stop()
  }
}
