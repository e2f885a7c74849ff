package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Similarity

/** The codegen dot product must be bit-identical to its declarative HOF
  * twin (which is what the DuckDB oracle replicates), and faster. */
class DotProductSpec extends SparkSpec {

  test("codegen dot == HOF dot bit-for-bit on real embeddings") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q))
      .select(
        DotProduct(col("qe"), col("embedding")).as("native"),
        Similarity.dotHof(col("qe"), col("embedding")).as("hof"))
    val bad = both.where(col("native") =!= col("hof")).count()
    assert(bad === 0L)
    assert(both.count() > 0)
  }

  test("self dot of a unit vector is ~1, null-safe on null arrays") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(5)
    val selfDots = e.select(DotProduct(col("embedding"), col("embedding")))
      .as[Double].collect()
    selfDots.foreach(d => assert(math.abs(d - 1.0) < 1e-5))
    val withNull = Seq((Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    assert(withNull.select(DotProduct(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("length mismatch yields NULL, matching the zip_with twin") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f))).toDF("a", "b")
    // both forms agree: zip_with null-pads and the null poisons the fold
    val r = df.select(DotProduct(col("a"), col("b")).as("native"),
                      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("codegen dot participates in whole-stage codegen") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.limit(1).select(col("embedding").as("qe"))
    val df = e.crossJoin(broadcast(q))
      .select(DotProduct(col("qe"), col("embedding")).as("d"))
    df.collect() // let AQE finalize the physical plan
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' marks operators inside a WholeStageCodegen stage
    assert("""\*\(\d+\) Project \[graft_dot""".r.findFirstIn(plan).isDefined, plan)
  }
}
