package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Testdata schema canary: the driver regenerates /root/testdata between
  * rounds and has already changed a physical column encoding once
  * (events.ts: TIMESTAMP(NANOS) → timestamp[us]), which silently broke every
  * consumer of the table until the next verification run. This suite fails
  * FAST and LOUD if any table loader no longer analyzes against the data on
  * disk — each loader must adapt to what the footer says, never hardcode a
  * physical type.
  */
class TestdataCanarySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private val loaders: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
    "lineitem" -> (() => Tables.lineitem(spark, dir)),
    "orders" -> (() => Tables.orders(spark, dir)),
    "customer" -> (() => Tables.customer(spark, dir)),
    "supplier" -> (() => Tables.supplier(spark, dir)),
    "part" -> (() => Tables.part(spark, dir)),
    "nation" -> (() => Tables.nation(spark, dir)),
    "region" -> (() => Tables.region(spark, dir)),
    "events" -> (() => Tables.events(spark, dir)),
    "documents" -> (() => Tables.documents(spark, dir)),
    "embeddings" -> (() => Tables.embeddings(spark, dir))
  )

  test("every table loader analyzes and materializes against the on-disk schema") {
    loaders.foreach { case (name, load) =>
      val df = withClue(s"loader $name failed to analyze: ") { load() }
      // force one full row through the physical plan — analysis alone does
      // not exercise the vectorized reader's physical-type handling
      withClue(s"loader $name failed to read a row: ") {
        assert(df.limit(1).count() == 1L, s"table $name is empty")
      }
    }
  }

  test("all scale factors share one physical schema per table") {
    // the driver regenerates all SFs together; a regeneration that
    // changes an encoding at one SF but not another would pass sf0.001
    // tests and still break the sf0.01 verify / sf0.1 bench — footer
    // probes are cheap, so compare all three
    val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").filter(d => new java.io.File(d).isDirectory)
    loaders.map(_._1).foreach { name =>
      val schemas = sfDirs.map(d =>
        d -> Tables.load(spark, d, name).schema)
      schemas.tail.foreach { case (d, sch) =>
        assert(sch == schemas.head._2,
          s"table $name: $d stores ${sch.treeString} but ${schemas.head._1} " +
            s"stores ${schemas.head._2.treeString}")
      }
    }
  }

  test("nanosAsLong legacy conf does not cross-talk non-nanos timestamp reads") {
    // Tables.events' nanos fallback sets spark.sql.legacy.parquet.nanosAsLong
    // session-wide. That conf only changes how TIMESTAMP(NANOS) columns decode
    // (long instead of analysis error) — this canary proves a mixed-encoding
    // session stays correct: with the conf ON, a TimestampNTZ file and a UTC
    // TimestampType file written and read back in the SAME session keep their
    // logical types and values. (Spark cannot write TIMESTAMP(NANOS), so the
    // nanos side itself is exercised by the loader-probe path when the driver
    // regenerates testdata with that encoding.)
    import org.apache.spark.sql.functions._
    val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ts-canary").toString
      val base = spark.range(3).select(
        col("id"),
        timestamp_micros(col("id") * 1000000L + 1700000000000000L).as("t"))
      base.write.mode("overwrite").parquet(s"$tmp/utc")
      base.select(col("id"), col("t").cast(TimestampNTZType).as("t"))
        .write.mode("overwrite").parquet(s"$tmp/ntz")
      val utcBack = spark.read.parquet(s"$tmp/utc")
      val ntzBack = spark.read.parquet(s"$tmp/ntz")
      assert(utcBack.schema("t").dataType == TimestampType)
      assert(ntzBack.schema("t").dataType == TimestampNTZType)
      val utcVals = utcBack.select(unix_micros(col("t"))).orderBy("t")
        .collect().map(_.getLong(0)).toSeq
      val ntzVals = ntzBack
        .select(unix_micros(col("t").cast(TimestampType))).orderBy("t")
        .collect().map(_.getLong(0)).toSeq
      val expect = Seq(0L, 1L, 2L).map(_ * 1000000L + 1700000000000000L)
      assert(utcVals == expect, s"UTC timestamps corrupted under nanosAsLong: $utcVals")
      assert(ntzVals == expect, s"NTZ timestamps corrupted under nanosAsLong: $ntzVals")
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    }
  }

  test("events.ts is normalized to session-TZ TimestampType whatever the file stores") {
    // the stored encoding may be nanos-as-long, timestamp[us] (NTZ), or UTC
    // timestamp across regenerations; the loader's contract is a single
    // logical type downstream operators can bank on
    val tsType = Tables.events(spark, dir).schema("ts").dataType
    assert(tsType == TimestampType,
      s"events loader must yield TimestampType, got $tsType")
    assert(tsType != TimestampNTZType)
  }
}
