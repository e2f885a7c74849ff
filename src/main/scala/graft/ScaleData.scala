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
 * Usage: runMain graft.ScaleData <srcSfDir> <outDir> <factor> [tables]
 * The output dir serves as a drop-in SPARK_GRAFT_SF_DIR for Bench — the
 * evidence behind "would this plan survive 100×" is a measured run, not
 * a guess (see SURVEY.md §5a). The optional 4th arg is a comma-separated
 * table subset (e.g. "embeddings,documents") for targeted extreme-SF
 * ledgers where regenerating the full warehouse would dominate the run.
 */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val wanted: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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
    // measured output explosion, not plan scaling. Per-replica transforms
    // must (a) be IDENTITY at i=0 (the source replica anchors the planted-
    // dup fixtures), (b) preserve within-replica near-dup structure (one
    // transform per replica — Jaccard/cosine between a doc and its plant
    // are invariant), (c) kill cross-replica overlap for EVERY i.
    //
    // Text: a seeded pseudorandom alphabet PERMUTATION per replica (the r4
    // rotation had only 25 classes, so at 1000× each text recurred ~40×
    // and the true pair count grew as C(40,2) per group — output growth
    // masquerading as plan cost). Two random permutations agree on ~1
    // letter, so token/shingle overlap across replicas is ~zero, and
    // 26!≈4e26 classes never recur at any realistic factor. Embeddings:
    // a seeded ±1 sign pattern per dim (norm-preserving, kills cosine
    // alignment; 2^dims classes) on top of the circular shift.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def permText(d: DataFrame, i: Int): DataFrame =
      if (i == 0) d
      else {
        val perm = new scala.util.Random(i * 2654435761L)
          .shuffle(alpha.toList).mkString
        d.withColumn("text", translate(col("text"), alpha, perm))
      }
    val dims = table("embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    def permVec(d: DataFrame, i: Int): DataFrame =
      if (i == 0) d
      else {
        val rnd = new scala.util.Random(i * 40503L + 7)
        val signs = Seq.fill(dims)(if (rnd.nextBoolean()) 1.0f else -1.0f)
        val r = i % dims
        val shifted =
          if (r == 0) col("embedding")
          else concat(slice(col("embedding"), r + 1, 100000),
                      slice(col("embedding"), 1, r))
        d.withColumn("embedding",
          zip_with(shifted, typedLit(signs), (x, s) => (x * s).cast("float")))
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
    lazy val nEvents = table("events").count()

    // thunked per table so a subset run never touches the others' inputs
    val jobs = Seq[(String, () => DataFrame)](
      ("orders", () => replicate(table("orders"),
        Map("o_orderkey" -> orderStride, "o_custkey" -> custStride))),
      ("lineitem", () => replicate(table("lineitem"),
        Map("l_orderkey" -> orderStride))),
      ("customer", () => replicate(table("customer"), Map("c_custkey" -> custStride))),
      ("events", () => replicate(table("events"),
        Map("event_id" -> nEvents, "user_id" -> userStride))),
      ("documents", () => replicate(table("documents"), Map("doc_id" -> docStride), permText)),
      ("embeddings", () => replicate(table("embeddings"), Map("vec_id" -> docStride), permVec)),
      ("region", () => table("region")),
      ("nation", () => table("nation")),
      ("supplier", () => table("supplier")),
      ("part", () => table("part")))

    wanted.foreach { w =>
      val unknown = w -- jobs.map(_._1).toSet
      require(unknown.isEmpty, s"ScaleData: unknown tables ${unknown.mkString(",")}")
    }
    jobs.filter { case (name, _) => wanted.forall(_.contains(name)) }
      .foreach { case (name, df) =>
        df().write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[scale] $name written")
      }
    spark.stop()
  }
}
