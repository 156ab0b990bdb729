package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ticker csv: header dropped, symbols trimmed and uppercased") {
    val f = Files.createTempFile("tickers", ".csv")
    Files.writeString(f, "symbol\naapl\n NVDA \n\nmsft\n")
    val out = Sources.tickerCsv(spark, f.toString).as[String].collect().sorted
    assert(out.toSeq == Seq("AAPL", "MSFT", "NVDA"))
  }

  test("ndjson with rescue: malformed lines land in _rescued_data, not dropped") {
    val dir = Files.createTempDirectory("ndjson")
    Files.writeString(dir.resolve("part-0.json"),
      """{"symbol":"AAPL","revenue":1}
        |this is not json at all
        |{"symbol":"MSFT","revenue":2}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("symbol", StringType), StructField("revenue", LongType)))
    // Spark refuses corrupt-column-only queries on raw JSON — cache first
    val out = Sources.ndjsonWithRescue(spark, dir.toString, schema).cache()
    assert(out.count() == 3)
    assert(out.filter($"_rescued_data".isNotNull).count() == 1)
    assert(out.filter($"symbol" === "AAPL").count() == 1)
  }

  test("unionAll folds by name across frames") {
    val a = Seq((1L, "x")).toDF("id", "s")
    val b = Seq(("y", 2L)).toDF("s", "id") // different column order
    val out = Sources.unionAll(Seq(a, b))
    assert(out.count() == 2)
    assert(out.select(sum($"id")).collect()(0).getLong(0) == 3L)
  }
}
