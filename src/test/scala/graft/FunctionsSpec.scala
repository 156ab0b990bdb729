package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Envelope

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withIngestMeta: per-row uuid request_id + processing timestamp") {
    val rows = Envelope.withIngestMeta(Seq(1, 2, 3).toDF("x")).collect()
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    val ids = rows.map(_.getAs[String]("request_id"))
    assert(ids.forall(id => uuidRe.findFirstIn(id).isDefined))
    assert(ids.distinct.length == 3) // unique per row, not a literal
    val ptIdx = rows(0).fieldIndex("_processing_time")
    assert(rows.forall(!_.isNullAt(ptIdx)))
  }

  test("bench timeQuery: failure yields err marker, never a timing") {
    val ok = Bench.timeQuery(spark, TestSpark.sfDir, (s, d) => Tables.nation(s, d))
    assert(ok.isRight && ok.toOption.get >= 0.0)
    val bad = Bench.timeQuery(spark, TestSpark.sfDir,
      (s, d) => s.read.parquet(d + "/no_such_table.parquet"))
    assert(bad.isLeft && bad.swap.toOption.get.nonEmpty)
  }
}
