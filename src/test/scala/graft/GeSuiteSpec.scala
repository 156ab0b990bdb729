package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GeSuite

/** The declarative DQ contract: a verbatim copy of the reference's
  * Great-Expectations suite (`validation/expectations_prices.json`) must
  * parse and reproduce audit counts without any Scala-authored rules.
  */
class GeSuiteSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  // reference validation/expectations_prices.json, unmodified
  private val pricesSuiteJson =
    """{
      |  "expectation_suite_name": "prices_quality",
      |  "expectations": [
      |    {
      |      "expectation_type": "expect_column_to_exist",
      |      "kwargs": {
      |        "column": "symbol"
      |      }
      |    },
      |    {
      |      "expectation_type": "expect_column_to_exist",
      |      "kwargs": {
      |        "column": "date"
      |      }
      |    },
      |    {
      |      "expectation_type": "expect_column_values_to_not_be_null",
      |      "kwargs": {
      |        "column": "symbol"
      |      }
      |    },
      |    {
      |      "expectation_type": "expect_column_values_to_not_be_null",
      |      "kwargs": {
      |        "column": "date"
      |      }
      |    },
      |    {
      |      "expectation_type": "expect_column_values_to_be_between",
      |      "kwargs": {
      |        "column": "volume",
      |        "min_value": 0
      |      }
      |    },
      |    {
      |      "expectation_type": "expect_column_values_to_be_between",
      |      "kwargs": {
      |        "column": "close",
      |        "min_value": 0
      |      }
      |    }
      |  ]
      |}""".stripMargin

  private def prices = Seq(
    // (symbol, date, volume, close)
    (Some("AAPL"), Some("2024-09-13"), Some(1000L), Some(228.87)),
    (None: Option[String], Some("2024-09-16"), Some(2000L), Some(216.32)), // null symbol
    (Some("MSFT"), None: Option[String], Some(-5L), Some(431.34)), // null date, neg volume
    (Some("NVDA"), Some("2024-09-17"), None: Option[Long], Some(-1.0)), // null volume (passes between), neg close
    (Some("AMZN"), Some("2024-09-18"), Some(3000L), None: Option[Double]) // null close (passes between)
  ).toDF("symbol", "date", "volume", "close")

  test("reference prices suite parses: name, types, optional bounds") {
    val suite = GeSuite.parse(pricesSuiteJson)
    assert(suite.name == "prices_quality")
    assert(suite.expectations.map(_.name) == Seq(
      "exists_symbol", "exists_date", "not_null_symbol", "not_null_date",
      "between_volume", "between_close"))
    assert(suite.expectations.last.minValue.contains(0.0))
    assert(suite.expectations.last.maxValue.isEmpty)
  }

  test("audit under the reference suite reproduces GE violation counts") {
    val row = GeSuite.parse(pricesSuiteJson).audit(prices).collect().head
    assert(row.getAs[Long]("n_total") == 5)
    assert(row.getAs[Long]("n_viol_exists_symbol") == 0)
    assert(row.getAs[Long]("n_viol_exists_date") == 0)
    assert(row.getAs[Long]("n_viol_not_null_symbol") == 1)
    assert(row.getAs[Long]("n_viol_not_null_date") == 1)
    // GE between ignores NULLs: only the -5 volume and -1.0 close violate
    assert(row.getAs[Long]("n_viol_between_volume") == 1)
    assert(row.getAs[Long]("n_viol_between_close") == 1)
  }

  test("a missing column fails exists/not_null/between wholesale, not with an exception") {
    val noClose = prices.drop("close")
    val row = GeSuite.parse(pricesSuiteJson).audit(noClose).collect().head
    assert(row.getAs[Long]("n_viol_between_close") == 5) // every row flagged
    assert(row.getAs[Long]("n_viol_between_volume") == 1) // others unaffected
  }

  test("enforce + quarantine compose with suite-loaded rules") {
    val rules = GeSuite.parse(pricesSuiteJson).bind(prices)
    val kept = graft.operators.Expectations.enforce(prices, rules).count()
    val quarantined = graft.operators.Expectations.quarantine(prices, rules).count()
    assert(kept + quarantined == 5)
    assert(kept == 2) // AAPL (clean) and AMZN (null close passes between)
  }

  test("unsupported expectation types fail fast with the supported list") {
    val bad =
      """{"expectation_suite_name":"x","expectations":[
        |{"expectation_type":"expect_table_row_count_to_be_between","kwargs":{"column":"v"}}]}""".stripMargin
    val e = intercept[IllegalArgumentException](GeSuite.parse(bad))
    assert(e.getMessage.contains("expect_table_row_count_to_be_between"))
    assert(e.getMessage.contains("expect_column_values_to_be_between"))
  }

  test("non-numeric between bounds reject the suite instead of passing silently") {
    val bad =
      """{"expectation_suite_name":"x","expectations":[
        |{"expectation_type":"expect_column_values_to_be_between",
        | "kwargs":{"column":"d","min_value":"2024-01-01","max_value":"2024-12-31"}}]}""".stripMargin
    val e = intercept[IllegalArgumentException](GeSuite.parse(bad))
    assert(e.getMessage.contains("min_value must be numeric"))
    // explicit JSON null stays a legitimate half-open bound
    val halfOpen =
      """{"expectation_suite_name":"x","expectations":[
        |{"expectation_type":"expect_column_values_to_be_between",
        | "kwargs":{"column":"v","min_value":null,"max_value":5}}]}""".stripMargin
    val s = GeSuite.parse(halfOpen)
    assert(s.expectations.head.minValue.isEmpty && s.expectations.head.maxValue.contains(5.0))
  }

  test("engine-shipped events suite loads from the classpath and audits sf0.001") {
    val suite = GeSuite.loadResource("ge/expectations_events.json")
    assert(suite.name == "events_quality")
    val row = suite.audit(Tables.events(spark, TestSpark.sfDir)).collect().head
    assert(row.getAs[Long]("n_total") > 0)
  }
}
