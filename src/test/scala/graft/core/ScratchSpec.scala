package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/**
 * Pins the cluster-truthfulness contract of [[Scratch]]: every fixture
 * scratch dir resolves through the session's Hadoop FileSystem, honors
 * `spark.graft.scratchDir`, and round-trips data through an EXPLICIT
 * `file:`-scheme URI (the shape a production conf takes — s3a:/hdfs: —
 * exercised here with the scheme local mode can actually serve).
 */
class ScratchSpec extends SparkSpec {

  test("scratch root honors spark.graft.scratchDir with an explicit file: scheme") {
    val root = "file:/tmp/graft-scratch-spec-" + java.util.UUID.randomUUID()
    spark.conf.set("spark.graft.scratchDir", root)
    try {
      val d = Scratch.dir(spark, "spec_")
      // fully qualified: the returned path carries its scheme, so any
      // session resolves it to the SAME filesystem
      assert(d.toString.startsWith("file:/tmp/graft-scratch-spec-"),
        s"expected file:-qualified path under the conf root, got $d")
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(d), "allocated scratch dir must exist")
    } finally spark.conf.unset("spark.graft.scratchDir")
  }

  test("csv fixture round-trips through a file:-scheme scratch dir") {
    val root = "file:/tmp/graft-scratch-spec-" + java.util.UUID.randomUUID()
    spark.conf.set("spark.graft.scratchDir", root)
    try {
      import spark.implicits._
      val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", -0.125))
        .toDF("k", "s", "x")
      val dir = graft.sources.TextSources.scratchDir(spark, "csv_")
      assert(dir.startsWith("file:"), s"fixture dir must be FS-qualified: $dir")
      val back = graft.sources.TextSources.csvRoundtrip(spark, df, dir)
      assert(back.orderBy("k").collect().toSeq ===
             df.orderBy("k").collect().toSeq)
    } finally spark.conf.unset("spark.graft.scratchDir")
  }

  test("default root is the hadoop tmp dir, FS-qualified") {
    val d = Scratch.dir(spark, "dflt_")
    // local mode default FS is file: — the path must still be qualified
    assert(new Path(d.toString).toUri.getScheme == "file",
      s"default scratch must be FS-qualified, got $d")
  }
}
