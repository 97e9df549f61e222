package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: cheap failures for mistakes the scored harness
  * would surface only as silent downgrades (an oracle key that matches no
  * query is dead weight; a query missing from oracleSql silently becomes a
  * rows-only check; an analysis error would cost the whole query).
  */
class ContractSuite extends AnyFunSuite with SparkFixture {

  test("every oracle key names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("rows-only queries are the known, justified set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // xxhash64/HLL sketches have no DuckDB twin (SURVEY §2 A5/A16/L2b/L2c/F7b)
    assert(rowsOnly == Set("a5_approx_distinct", "a16_hll_union",
      "f7b_native_hash", "l2b_minhash_lsh", "l2c_simhash"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("every query analyzes against the sf0.001 corpus (no execution)") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").queryExecution.analyzed; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows (the driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names follow the section_operator convention") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z][a-z0-9]*(_[a-z0-9]+)+"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }
}
