package graft.queries

import graft.SparkSpec

/** Every SparkEntry query runs and returns rows at sf0.001 (hash-parity
  * with DuckDB is the driver's gate; this catches schema/runtime breaks). */
class CoreQueriesSpec extends SparkSpec {
  graft.SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and yields rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle (SQL or documented rows-only)") {
    val missing = graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet
    // rows-only checks are allowed but must be deliberate — list them here.
    val rowsOnly = Set("dedup_simhash", "dedup_embedding", "ann_ivf")
    assert((missing -- rowsOnly).isEmpty, s"queries without oracle: $missing")
  }
}
