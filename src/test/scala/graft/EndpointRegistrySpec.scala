package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EndpointRegistry
import graft.sources.EndpointRegistry.{PerDate, PerSymbol, SourceSpec}

/** Registry invariants mirroring the reference's endpoint-config tests
  * (`tests/test_fmp_dump_raw.py:196-245`), plus the engine-side sink the
  * registry keys.
  */
class EndpointRegistrySpec extends AnyFunSuite {

  private val reg = EndpointRegistry.endpoints

  test("registry covers the reference endpoints with names matching keys") {
    assert(reg.keySet == Set(
      "owner_earnings", "income", "balance_sheet", "cash_flow", "treasury_rates"))
    reg.foreach { case (k, spec) => assert(spec.name == k) }
  }

  test("all raw keys use the .ndjson.gz extension") {
    reg.values.foreach(s => assert(s.pathTemplate.endsWith(".ndjson.gz")))
    val e = intercept[IllegalArgumentException](
      SourceSpec("bad", "fmp/x/symbol={symbol}/x.parquet", PerSymbol))
    assert(e.getMessage.contains("NDJSON.gz"))
  }

  test("statement endpoints partition by symbol with no date partition") {
    Seq("income", "balance_sheet", "cash_flow", "owner_earnings").foreach { n =>
      val s = reg(n)
      assert(s.scheme == PerSymbol)
      assert(s.pathTemplate.contains("symbol="))
      assert(!s.pathTemplate.contains("dt="))
      assert(!s.supportsBackfill)
    }
  }

  test("treasury_rates partitions by date, market-wide, backfillable") {
    val t = reg("treasury_rates")
    assert(t.scheme == PerDate)
    assert(t.pathTemplate.contains("dt="))
    assert(!t.pathTemplate.contains("{symbol}"))
    assert(t.supportsBackfill)
  }

  test("malformed specs fail at construction, not at dump time") {
    // per-symbol without a symbol= partition
    assertThrows[IllegalArgumentException](
      SourceSpec("bad", "fmp/x/{symbol}-x.ndjson.gz", PerSymbol))
    // per-symbol with a date partition
    assertThrows[IllegalArgumentException](
      SourceSpec("bad", "fmp/x/symbol={symbol}/dt=1/x.ndjson.gz", PerSymbol))
    // per-date with a symbol placeholder
    assertThrows[IllegalArgumentException](
      SourceSpec("bad", "fmp/x/dt={date}/{symbol}-x.ndjson.gz", PerDate))
  }

  test("path resolution fills the scheme's placeholder under the raw root") {
    val income = reg("income").path("s3a://bucket/raw", symbol = "AAPL")
    assert(income == "s3a://bucket/raw/fmp/statements/income/symbol=AAPL/AAPL-income.ndjson.gz")
    val treasury = reg("treasury_rates").path("/data/raw/", date = "2024-10-25")
    assert(treasury == "/data/raw/fmp/treasury_rates/dt=2024-10-25/treasury-rates-2024-10-25.ndjson.gz")
    // resolving without the scheme's key is a usage error
    assertThrows[IllegalArgumentException](reg("income").path("/r"))
    assertThrows[IllegalArgumentException](reg("treasury_rates").path("/r"))
  }

  test("partitionDir is path's parent and matches where writeRaw lands files") {
    assert(reg("income").partitionDir("s3a://bucket/raw", symbol = "AAPL")
      == "s3a://bucket/raw/fmp/statements/income/symbol=AAPL")
    assert(reg("treasury_rates").partitionDir("/data/raw/", date = "2024-10-25")
      == "/data/raw/fmp/treasury_rates/dt=2024-10-25")
  }

  test("writeRaw keys the K2 sink off the registry and round-trips") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("rawroot").toString
    val df = Seq(
      ("AAPL", "2024-01-01", 1.0),
      ("AAPL", "2024-01-02", 2.0),
      ("MSFT", "2024-01-01", 3.0)).toDF("symbol", "d", "v")
    EndpointRegistry.writeRaw(df, reg("owner_earnings"), root)
    // layout: <root>/fmp/owner_earnings/symbol=<symbol>/... gzipped json
    val base = java.nio.file.Paths.get(root, "fmp", "owner_earnings")
    assert(java.nio.file.Files.exists(base.resolve("symbol=AAPL")))
    assert(java.nio.file.Files.walk(base).toArray.map(_.toString)
      .exists(_.endsWith(".json.gz")))
    val back = EndpointRegistry.readRaw(spark, reg("owner_earnings"), root)
    assert(back.count() == 3)
    assert(back.columns.contains("symbol")) // partition column recovered
    assert(back.filter($"symbol" === "AAPL").count() == 2)
  }
}
