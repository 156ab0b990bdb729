package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: every registered query must keep its oracle
  * twin (a missing oracle silently downgrades the driver's check to
  * rows-only) and must at least analyze against the smallest testdata.
  */
class ContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("every query analyzes against sf0.001 (schema resolvable, nonempty)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, TestSpark.sfDir).schema
      assert(schema.nonEmpty, s"$name produced an empty schema")
    }
  }

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
