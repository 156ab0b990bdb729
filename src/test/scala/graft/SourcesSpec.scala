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

  test("ORC format parity: lossless round-trip with predicate pushdown") {
    // the engine is parquet-first, but Spark's ORC path shares the same
    // DataSource v2 machinery — prove the lake can carry either format
    // without losing data or the scan-level filter pushdown
    val dir = Files.createTempDirectory("orc").toString + "/docs"
    val docs = Tables.documents(spark, TestSpark.sfDir)
    docs.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.agg(sum(crc32(col("text")))).collect()(0).getLong(0)
      == docs.agg(sum(crc32(col("text")))).collect()(0).getLong(0))
    val plan = back.filter(col("doc_id") < 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(doc_id,50)"),
      s"ORC scan must carry the pushed predicate:\n$plan")
  }

  test("ndjson with rescue: malformed lines land in _rescued_data, not dropped") {
    val dir = Files.createTempDirectory("ndjson")
    Files.writeString(dir.resolve("part-0.json"),
      """{"symbol":"AAPL","revenue":1}
        |this is not json at all
        |{"symbol":"MSFT","revenue":2}
        |""".stripMargin)
    // nested date directory, discovered via recursiveFileLookup
    Files.createDirectories(dir.resolve("dt=2024-01-02"))
    Files.writeString(dir.resolve("dt=2024-01-02").resolve("part-1.json"),
      "{\"symbol\":\"NVDA\",\"revenue\":3}\n")
    val schema = StructType(Seq(
      StructField("symbol", StringType), StructField("revenue", LongType)))
    val out = Sources.ndjsonWithRescue(spark, dir.toString, schema).cache()
    assert(out.count() == 4)
    assert(out.filter($"_rescued_data".isNotNull).count() == 1)
    assert(out.filter($"symbol" === "AAPL").count() == 1)
    assert(out.filter($"symbol" === "NVDA").count() == 1)
    // the malformed line is rescued whole
    assert(out.filter($"_rescued_data" === "this is not json at all").count() == 1)
  }

  test("ndjson rescue captures undeclared extra fields on valid rows") {
    val dir = Files.createTempDirectory("ndjson_extra")
    Files.writeString(dir.resolve("part-0.json"),
      """{"symbol":"AAPL","revenue":1}
        |{"symbol":"TSLA","revenue":4,"surprise":"extra","nested":{"a":1},"n":2}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("symbol", StringType), StructField("revenue", LongType)))
    val out = Sources.ndjsonWithRescue(spark, dir.toString, schema).cache()
    assert(out.count() == 2)
    // clean row: no rescue
    assert(out.filter($"symbol" === "AAPL" && $"_rescued_data".isNull).count() == 1)
    // extra-field row: declared columns populate AND the extras are kept,
    // original JSON values intact (string stays quoted, number unquoted,
    // nested object preserved), with the _file_path breadcrumb
    val row = out.filter($"symbol" === "TSLA").collect()(0)
    assert(row.getAs[Long]("revenue") == 4)
    val rescued = row.getAs[String]("_rescued_data")
    assert(rescued.contains("\"surprise\":\"extra\""))
    assert(rescued.contains("\"nested\":{\"a\":1}"))
    assert(rescued.contains("\"n\":2"))
    assert(rescued.contains("\"_file_path\"") && rescued.contains("part-0.json"))
    assert(!rescued.contains("\"symbol\"")) // declared fields are not rescued
  }

  test("withInputFile exposes the source file path per row") {
    val out = Sources.withInputFile(
      spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet"))
    val paths = out.select("_input_file").distinct().as[String].collect()
    assert(paths.length == 1 && paths(0).endsWith("nation.parquet"))
  }

  test("clusteredParquet writes range-clustered sorted files") {
    val dir = Files.createTempDirectory("clustered").toString + "/t"
    val df = spark.range(1000).toDF("id")
      .withColumn("k", $"id" % 7).withColumn("v", $"id" * 2)
    graft.sinks.Sinks.clusteredParquet(df, dir, Seq("k", "id"), numFiles = Some(4))
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    // each output file covers a narrow contiguous range of k
    val perFile = Sources.withInputFile(back)
      .groupBy("_input_file").agg((max($"k") - min($"k")).as("spread"))
      .agg(max($"spread")).collect()(0).getLong(0)
    assert(perFile <= 3)
  }

  test("catalog DDL: CREATE TABLE USING parquet LOCATION round-trips via spark.table") {
    val loc = s"${TestSpark.sfDir}/nation.parquet"
    val direct = spark.read.parquet(loc).count()
    val t = graft.sources.Catalog.registerParquet(spark, "nation_reg", loc)
    assert(t.count() == direct)
    assert(spark.sql("SELECT count(*) FROM nation_reg").collect()(0).getLong(0) == direct)
    graft.sources.Catalog.deregister(spark, "nation_reg")
    assert(!spark.catalog.tableExists("nation_reg"))
  }

  test("catalog registration: quoted paths survive, conflicting re-register throws") {
    import graft.sources.Catalog
    // a single quote in the location must not break the DDL
    val dir = Files.createTempDirectory("cat'log")
    spark.range(3).write.mode("overwrite").parquet(dir.toString + "/t")
    val t = Catalog.registerParquet(spark, "quoted_loc", dir.toString + "/t")
    assert(t.count() == 3)
    // idempotent re-register at the SAME location is fine
    assert(Catalog.registerParquet(spark, "quoted_loc", dir.toString + "/t").count() == 3)
    // same name, DIFFERENT location: must fail loudly, not silently return
    // the table at the old location
    val other = Files.createTempDirectory("catother")
    spark.range(5).write.mode("overwrite").parquet(other.toString + "/t")
    val e = intercept[IllegalStateException](
      Catalog.registerParquet(spark, "quoted_loc", other.toString + "/t"))
    assert(e.getMessage.contains("already registered"))
    Catalog.deregister(spark, "quoted_loc")
  }

  test("catalog stats: registered table sizes IVF from metadata, zero count jobs") {
    import graft.sources.Catalog
    import graft.llm.Similarity
    val loc = s"${TestSpark.sfDir}/embeddings.parquet"
    val n = spark.read.parquet(loc).count()
    val t = Catalog.registerParquet(spark, "emb_reg", loc)
    try {
      assert(Catalog.rowCount(spark, "emb_reg").contains(n)) // ANALYZE ran
      // planStats propagates the catalog count into the optimized plan
      assert(t.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong).contains(n))
      val sc = spark.sparkContext
      sc.setJobGroup("ivf-sizing-probe", "no jobs expected during construction")
      val df = try Similarity.ivfTopK(spark.table("emb_reg"), "vec_id", "embedding",
        isQuery = $"vec_id" < 2, k = 3, nProbe = 2)
      finally sc.clearJobGroup()
      Thread.sleep(500) // status store is async; let a would-be job surface
      assert(sc.statusTracker.getJobIdsForGroup("ivf-sizing-probe").isEmpty,
        "ivfTopK construction ran a Spark job despite catalog stats")
      assert(df.count() > 0)
    } finally Catalog.deregister(spark, "emb_reg")
  }

  test("bucketed tables: co-located join plans without a shuffle exchange") {
    import graft.sinks.Sinks
    val orders = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
    val customer = spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    Sinks.bucketedTable(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", Seq("o_custkey"), 4)
    Sinks.bucketedTable(customer.select("o_custkey", "c_name"),
      "customer_b", Seq("o_custkey"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(j.count() ==
        orders.join(customer, Seq("o_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("unionAll folds by name across frames") {
    val a = Seq((1L, "x")).toDF("id", "s")
    val b = Seq(("y", 2L)).toDF("s", "id") // different column order
    val out = Sources.unionAll(Seq(a, b))
    assert(out.count() == 2)
    assert(out.select(sum($"id")).collect()(0).getLong(0) == 3L)
  }
}
