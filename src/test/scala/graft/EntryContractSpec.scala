package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: every declared query must carry an oracle
  * and vice versa. A typo'd key on either side silently downgrades the
  * driver's compare (an oracle with no result directory, or a result the
  * compare never reads) — exactly the class of quiet coverage loss the
  * round-6 verdict flagged on the Verify side. */
class EntryContractSpec extends AnyFunSuite {

  test("queries and oracleSql declare the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missingOracle = q -- o
    val orphanOracle = o -- q
    assert(missingOracle.isEmpty, s"queries without oracle: $missingOracle")
    assert(orphanOracle.isEmpty, s"oracles without query: $orphanOracle")
  }

  test("query names follow the qNN_slug convention") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming query names: $bad")
  }

  test("every oracle pins a total order (ORDER BY or LIMIT-free scalar)") {
    // Row-by-row hash compare requires deterministic output order; every
    // oracle should carry an ORDER BY (single-row scalars excepted).
    val unordered = SparkEntry.oracleSql.collect {
      case (k, sql) if !sql.toUpperCase.contains("ORDER BY") => k
    }
    assert(unordered.isEmpty, s"oracles without ORDER BY: $unordered")
  }
}
