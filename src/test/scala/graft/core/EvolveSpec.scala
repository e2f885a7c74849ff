package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for [[Catalog.addColumn]] — metadata-only schema
  * evolution (ADD COLUMN) through the warehouse lifecycle. */
class EvolveSpec extends SparkSpec {

  private def freshCat(autoCompact: Boolean = true): (Catalog, String) = {
    val wh = Files.createTempDirectory("graft_evolve_").toString
    (new Catalog(spark, wh, autoCompact = autoCompact), wh)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def seed(cat: Catalog): Unit = {
    import spark.implicits._
    cat.createTable("t", "k",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"))
  }

  test("added column reads null on pre-evolve rows, set values after") {
    val (cat, _) = freshCat()
    seed(cat)
    cat.addColumn("t", "n", "bigint")
    cat.commit("t", Txn.empty.update(col("k") === 2L, Map("n" -> lit(7L))))
    assert(rows(cat.getTable("t").snapshot) ===
      Set(Seq(1L, "a", null), Seq(2L, "b", 7L), Seq(3L, "c", null)))
    // the evolve is invisible to version addressing: one step back is the
    // pre-update state, all-null in the new column
    assert(rows(cat.getTable("t").asOfRelative(-1)) ===
      Set(Seq(1L, "a", null), Seq(2L, "b", null), Seq(3L, "c", null)))
  }

  test("evolution survives compaction and vacuum (files rewritten)") {
    val (cat, _) = freshCat(autoCompact = false)
    seed(cat)
    cat.addColumn("t", "n", "bigint")
    cat.commit("t", Txn.empty.update(col("k") === 2L, Map("n" -> lit(7L))))
    cat.saveCompacted("t", cat.getTable("t").compact)
    val expected =
      Set(Seq(1L, "a", null), Seq(2L, "b", 7L), Seq(3L, "c", null))
    assert(rows(cat.getTable("t").snapshot) === expected)
    cat.commit("t", Txn.empty.update(col("k") === 3L, Map("n" -> lit(9L))))
    cat.vacuum("t", keep = 2)
    assert(rows(cat.getTable("t").snapshot) ===
      Set(Seq(1L, "a", null), Seq(2L, "b", 7L), Seq(3L, "c", 9L)))
  }

  test("a tail mixing pre- and post-evolve files keeps every set value") {
    // the risky layout: file A written BEFORE the add (lacks the column),
    // file B after (carries it). A single-file schema inference over the
    // tail would drop the column whenever listing order sampled file A —
    // getTable must merge the footers' schemas, deterministically.
    val (cat, _) = freshCat(autoCompact = false)
    seed(cat)
    cat.commit("t", Txn.empty.update(col("k") === 1L, Map("s" -> lit("a2"))))
    cat.addColumn("t", "n", "bigint")
    cat.commit("t", Txn.empty.update(col("k") === 2L, Map("n" -> lit(7L))))
    assert(rows(cat.getTable("t").snapshot) ===
      Set(Seq(1L, "a2", null), Seq(2L, "b", 7L), Seq(3L, "c", null)))
  }

  test("a column added before ANY commit materializes at its declared type") {
    val (cat, _) = freshCat()
    seed(cat)
    val t = cat.addColumn("t", "score", "double")
    assert(t.snapshot.schema("score").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(rows(t.snapshot.select(col("k"), col("score"))) ===
      Set(Seq(1L, null), Seq(2L, null), Seq(3L, null)))
  }

  test("duplicate or malformed adds are rejected at the API boundary") {
    val (cat, _) = freshCat()
    seed(cat)
    cat.addColumn("t", "n", "bigint")
    intercept[IllegalArgumentException](cat.addColumn("t", "n", "bigint"))
    intercept[IllegalArgumentException](
      cat.addColumn("t", "m", "decimal(10,2)")) // non-identifier type
    intercept[Exception](cat.addColumn("t", "m", "bigiint")) // unparseable
    intercept[IllegalArgumentException](
      cat.addColumn("t", "_ver", "bigint")) // reserved lineage stamp
    intercept[IllegalArgumentException](
      cat.addColumn("t", "_rn", "bigint")) // reserved window rank
    // every rejection happened BEFORE the meta write: the table still opens
    assert(cat.getTable("t").dataCols === Seq("k", "s", "n"))
  }

  test("evolved tables compose with CDC diff and restore") {
    val (cat, _) = freshCat(autoCompact = false)
    seed(cat)
    cat.addColumn("t", "n", "bigint")
    cat.commit("t", Txn.empty.update(col("k") === 2L, Map("n" -> lit(7L))))
    val t = cat.getTable("t")
    // the diff's payload structs carry the evolved schema: the change is
    // an update from null to the set value
    assert(rows(t.diffRelative(-1)) ===
      Set(Seq(2L, "update", "b", null, "b", 7L)))
    // restore unwinds the post-evolve write; the column stays in the
    // schema (evolution is metadata, restore is data)
    assert(rows(t.restore(-1).snapshot) ===
      Set(Seq(1L, "a", null), Seq(2L, "b", null), Seq(3L, "c", null)))
  }

  test("evolution persists across catalog reopen (metadata round-trip)") {
    val (cat, wh) = freshCat()
    seed(cat)
    cat.addColumn("t", "n", "bigint")
    cat.commit("t", Txn.empty.update(col("k") === 1L, Map("n" -> lit(5L))))
    val reopened = new Catalog(spark, wh)
    assert(rows(reopened.getTable("t").snapshot) ===
      Set(Seq(1L, "a", 5L), Seq(2L, "b", null), Seq(3L, "c", null)))
  }
}
