package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that need no SparkSession. */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are stable identifiers") {
    SparkEntry.queries.keySet.foreach { n =>
      assert(n.matches("[a-z0-9_]+"), s"non-identifier query name: $n")
    }
  }
}
