package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.CommitLogTable

/** GENERATED ALWAYS AS columns — Delta's generated columns
  * (`docs/databricks_setup.md`'s Bronze date-partitioning idiom:
  * `day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))`). Stored as
  * `graft.generated.<col>` table properties; every batch write plane
  * fills an omitted generated column from its expression and
  * row-asserts a provided one; UPDATE recomputes; dropping/renaming a
  * referenced base column refuses.
  */
class GeneratedColumnsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val cat = "graftgencols"
  private lazy val setup: Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.CommitLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      Files.createTempDirectory("graft-gencols-wh").toString)
  }

  test("SQL CREATE TABLE with a generated partition column: the DDL " +
      "round-trips into properties; DataFrame appends fill the column") {
    setup
    spark.sql(s"""CREATE TABLE $cat.ns.ev (
        k BIGINT, ts TIMESTAMP,
        day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
      PARTITIONED BY (day)""")
    val dir = spark.sql(s"DESCRIBE DETAIL $cat.ns.ev")
      .select("location").head().getString(0)
    val t = CommitLogTable.open(spark, dir)
    assert(t.properties.get("graft.generated.day")
      .exists(_.toUpperCase.contains("CAST")), t.properties.toString)
    // a batch that OMITS day gets it computed — and lands partitioned
    t.append(Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-03-02 11:00:00")))
      .toDF("k", "ts"))
    val m = t.resolvedManifest(None)
    assert(m.files.map(_.partitionVals.head).sorted ==
      Seq("2024-03-01", "2024-03-02"))
    assert(spark.sql(s"SELECT day FROM $cat.ns.ev WHERE k = 2")
      .head().getDate(0).toString == "2024-03-02")
    // partition pruning on the generated column works like any other
    val pruned = spark.sql(
      s"SELECT k FROM $cat.ns.ev WHERE day = DATE'2024-03-01'")
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(pruned.queryExecution.executedPlan.toString.contains("files=1/2"))
  }

  test("explicit values are ASSERTED row-by-row: matching pass, a " +
      "mismatch fails the write loudly and commits nothing") {
    setup
    spark.sql(s"""CREATE TABLE $cat.ns.ev2 (
        k BIGINT, ts TIMESTAMP,
        day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))""")
    val dir = spark.sql(s"DESCRIBE DETAIL $cat.ns.ev2")
      .select("location").head().getString(0)
    val t = CommitLogTable.open(spark, dir)
    // SQL INSERT provides day explicitly — correct values pass
    spark.sql(s"INSERT INTO $cat.ns.ev2 VALUES " +
      "(1, TIMESTAMP'2024-03-01 10:00:00', DATE'2024-03-01')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.ev2").head().getLong(0) == 1)
    // a wrong explicit value fails the write (GENERATED ALWAYS), and the
    // failed commit publishes nothing
    val before = t.latestVersion
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO $cat.ns.ev2 VALUES " +
        "(2, TIMESTAMP'2024-03-01 10:00:00', DATE'1999-01-01')"))
    def msgs(x: Throwable): Seq[String] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("GENERATED ALWAYS")), msgs(e).toString)
    assert(t.latestVersion == before)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.ev2").head().getLong(0) == 1)
  }

  test("UPDATE recomputes generated columns when a base changes and " +
      "refuses to SET them directly; merge fills like append") {
    val dir = Files.createTempDirectory("graft-gencols-upd").toString + "/t"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, ts TIMESTAMP, day DATE")
    val t = CommitLogTable.create(spark, dir, schema)
    t.setProperties(Map("graft.generated.day" -> "CAST(ts AS DATE)"))
    t.append(Seq((1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00")))
      .toDF("k", "ts"))
    // merge (upsert) fills the generated column for inserted rows too
    t.merge(Seq((2L, java.sql.Timestamp.valueOf("2024-04-05 09:00:00")))
      .toDF("k", "ts"), Seq("k"), Seq(col("ts")))
    assert(t.read().filter($"k" === 2).head().getDate(2).toString ==
      "2024-04-05")
    // UPDATE of the base recomputes the generated value
    t.update($"k" === 1L, Map("ts" ->
      lit(java.sql.Timestamp.valueOf("2025-12-31 23:00:00"))))
    assert(t.read().filter($"k" === 1).head().getDate(2).toString ==
      "2025-12-31")
    // SET on the generated column itself refuses
    val e = intercept[IllegalArgumentException](
      t.update($"k" === 1L, Map("day" -> lit("2020-01-01").cast("date"))))
    assert(e.getMessage.contains("generated column"), e.getMessage)
    // dropping/renaming the referenced base column refuses; dropping the
    // generated column itself retires its property
    val e2 = intercept[IllegalArgumentException](t.dropColumn("ts"))
    assert(e2.getMessage.contains("GENERATED ALWAYS"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](t.renameColumn("ts", "ts2"))
    assert(e3.getMessage.contains("GENERATED ALWAYS"), e3.getMessage)
    t.dropColumn("day")
    assert(!t.properties.contains("graft.generated.day"))
    t.renameColumn("ts", "ts2") // no longer referenced: renames fine
  }

  test("IDENTITY columns: assignment is unique and increasing across " +
      "commits, the high-water mark syncs in the same commit, and " +
      "GENERATED ALWAYS refuses explicit values") {
    setup
    spark.sql(s"""CREATE TABLE $cat.ns.idt (
        id BIGINT GENERATED ALWAYS AS IDENTITY,
        v STRING)""")
    val dir = spark.sql(s"DESCRIBE DETAIL $cat.ns.idt")
      .select("location").head().getString(0)
    val t = CommitLogTable.open(spark, dir)
    assert(t.properties.get("graft.identity.id").contains("1,1,false"),
      t.properties.toString)
    t.append(Seq("a", "b", "c").toDF("v"))
    val first = t.read().select("id").collect().map(_.getLong(0)).toSeq
    assert(first.distinct.size == 3 && first.min >= 1)
    assert(t.properties("graft.identity.id.highWater").toLong == first.max)
    // the next batch continues PAST the synced high water
    t.append(Seq("d", "e").toDF("v"))
    val all = t.read().select("id").collect().map(_.getLong(0)).toSeq
    assert(all.distinct.size == 5)
    assert(all.filterNot(first.contains).min > first.max,
      s"second batch must start past ${first.max}: $all")
    // GENERATED ALWAYS: an explicit id refuses
    val e = intercept[Exception](
      t.append(Seq((99L, "z")).toDF("id", "v")))
    assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"),
      e.getMessage)
    // ...and a merge source must CARRY the column (latest-wins merge
    // replaces whole rows; a fresh id would re-key existing rows)
    val e2 = intercept[Exception](
      t.merge(Seq("f").toDF("v"), Seq("v"), Seq(col("v"))))
    assert(e2.getMessage.contains("cannot assign identity"), e2.getMessage)
  }

  test("GENERATED BY DEFAULT AS IDENTITY accepts explicit values and " +
      "advances the watermark past them") {
    setup
    spark.sql(s"""CREATE TABLE $cat.ns.idd (
        id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 100
          INCREMENT BY 10),
        v STRING)""")
    val dir = spark.sql(s"DESCRIBE DETAIL $cat.ns.idd")
      .select("location").head().getString(0)
    val t = CommitLogTable.open(spark, dir)
    assert(t.properties.get("graft.identity.id").contains("100,10,true"))
    t.append(Seq("a").toDF("v"))
    assert(t.read().head().getLong(0) == 100L)
    // explicit insert allowed; the watermark advances past it
    spark.sql(s"INSERT INTO $cat.ns.idd VALUES (5000, 'x')")
    assert(t.properties("graft.identity.id.highWater").toLong == 5000L)
    t.append(Seq("b").toDF("v"))
    val ids = t.read().select("id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(100L) && ids.contains(5000L))
    assert(ids.exists(_ > 5000L), ids.toString)
  }

  test("MERGE INTO enforces the same rules: UPDATE recomputes generated " +
      "columns, INSERT fills omitted ones and asserts provided ones, " +
      "identity clauses are guarded") {
    val dir = Files.createTempDirectory("graft-gencols-mi").toString + "/t"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, ts TIMESTAMP, day DATE")
    val t = CommitLogTable.create(spark, dir, schema)
    t.setProperties(Map("graft.generated.day" -> "CAST(ts AS DATE)"))
    t.append(Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("k", "ts"))
    val src = Seq(
      (1L, java.sql.Timestamp.valueOf("2025-06-06 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2025-07-07 10:00:00")))
      .toDF("k", "ts")
    // matched UPDATE sets ts → day recomputes; not-matched INSERT omits
    // day → computed from the expression
    t.mergeInto(src, col("t.k") === col("s.k"),
      matched = Seq(CommitLogTable.MatchedUpdate(None,
        Map("ts" -> col("s.ts")))),
      notMatched = Seq(CommitLogTable.NotMatchedInsert(None,
        Map("k" -> col("s.k"), "ts" -> col("s.ts")))),
      bySource = Seq.empty)
    val got = t.read().orderBy("k").collect()
      .map(r => r.getLong(0) -> r.getDate(2).toString).toMap
    assert(got == Map(1L -> "2025-06-06", 2L -> "2025-07-07"), got.toString)
    // a direct SET of the generated column refuses
    val e = intercept[IllegalArgumentException](t.mergeInto(src,
      col("t.k") === col("s.k"),
      matched = Seq(CommitLogTable.MatchedUpdate(None,
        Map("day" -> lit("2020-01-01").cast("date")))),
      notMatched = Seq.empty, bySource = Seq.empty))
    assert(e.getMessage.contains("generated column"), e.getMessage)
    // an INSERT providing a WRONG generated value fails the write
    val e2 = intercept[Exception](t.mergeInto(
      Seq((9L, java.sql.Timestamp.valueOf("2025-09-09 10:00:00")))
        .toDF("k", "ts"),
      col("t.k") === col("s.k"), matched = Seq.empty,
      notMatched = Seq(CommitLogTable.NotMatchedInsert(None,
        Map("k" -> col("s.k"), "ts" -> col("s.ts"),
          "day" -> lit("1999-01-01").cast("date")))),
      bySource = Seq.empty))
    def msgs(x: Throwable): Seq[String] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs(e2).exists(_.contains("GENERATED ALWAYS")), msgs(e2))
    // identity guards: ALWAYS identity tables refuse MERGE-INSERT
    val dir2 = Files.createTempDirectory("graft-gencols-mi2").toString + "/t"
    val t2 = CommitLogTable.create(spark, dir2,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING"))
    t2.setProperties(Map("graft.identity.id" -> "1,1,false"))
    t2.append(Seq("a").toDF("v"))
    val e3 = intercept[IllegalArgumentException](t2.mergeInto(
      Seq("b").toDF("v"), col("t.v") === col("s.v"),
      matched = Seq.empty,
      notMatched = Seq(CommitLogTable.NotMatchedInsert(None,
        Map("v" -> col("s.v")))), bySource = Seq.empty))
    assert(e3.getMessage.contains("ALWAYS AS IDENTITY"), e3.getMessage)
  }

  test("the streaming epoch sink VALIDATES generated columns per epoch " +
      "and refuses GENERATED ALWAYS identity") {
    setup
    spark.sql(s"""CREATE TABLE $cat.ns.evs (
        k BIGINT, ts TIMESTAMP,
        day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))""")
    val root = Files.createTempDirectory("graft-gencols-epoch").toString
    // a stream writing a WRONG day must fail the epoch and commit nothing
    Seq((1L, java.sql.Timestamp.valueOf("2024-06-01 08:00:00"),
      java.sql.Date.valueOf("1999-01-01"))).toDF("k", "ts", "day")
      .write.parquet(root + "/bad")
    val qBad = spark.readStream.schema(
        org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, ts TIMESTAMP, day DATE"))
      .parquet(root + "/bad").writeStream
      .option("checkpointLocation", root + "/ckptBad")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(s"$cat.ns.evs")
    val eStream = intercept[Exception](qBad.awaitTermination(120000))
    assert(Iterator.iterate(eStream: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(
        _.contains("GENERATED ALWAYS"))), eStream.getMessage)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.evs")
      .head().getLong(0) == 0, "the failed epoch must commit nothing")
    // a CORRECT day streams fine
    Seq((2L, java.sql.Timestamp.valueOf("2024-06-02 08:00:00"),
      java.sql.Date.valueOf("2024-06-02"))).toDF("k", "ts", "day")
      .write.parquet(root + "/good")
    val qGood = spark.readStream.schema(
        org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, ts TIMESTAMP, day DATE"))
      .parquet(root + "/good").writeStream
      .option("checkpointLocation", root + "/ckptGood")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(s"$cat.ns.evs")
    assert(qGood.awaitTermination(120000))
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.evs")
      .head().getLong(0) == 1)
  }

  test("identity hygiene: INT identity refuses at CREATE, dropColumn " +
      "retires the identity spec (table stays writable), renameColumn " +
      "refuses on an identity column") {
    setup
    // INT identity would overflow/collide — assignment adds p*2^33 per
    // partition, so only BIGINT is sound (Delta's rule)
    val e = intercept[Exception](spark.sql(
      s"""CREATE TABLE $cat.ns.idint (
          id INT GENERATED ALWAYS AS IDENTITY, v STRING)"""))
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
    // drop retires graft.identity.<col> AND its highWater — an orphaned
    // spec would make every later write throw in applyIdentity
    val dir = Files.createTempDirectory("graft-idhygiene").toString + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING"))
    t.setProperties(Map("graft.identity.id" -> "1,1,false"))
    t.append(Seq("a", "b").toDF("v"))
    assert(t.properties.contains("graft.identity.id.highWater"))
    val eRen = intercept[IllegalArgumentException](
      t.renameColumn("id", "id2"))
    assert(eRen.getMessage.contains("IDENTITY"), eRen.getMessage)
    t.dropColumn("id")
    assert(!t.properties.keys.exists(_.startsWith("graft.identity.")),
      t.properties.toString)
    t.append(Seq("c").toDF("v")) // writable again — no orphaned spec
    assert(t.read().count() == 3)
  }

  test("concurrent identity appends never duplicate ids: a losing " +
      "attempt that synced the high-water recomputes instead of " +
      "rebasing (the rebase would discard its advance)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = Files.createTempDirectory("graft-idrace").toString + "/t"
    val t = CommitLogTable.create(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING"))
    t.setProperties(Map("graft.identity.id" -> "1,1,false"))
    val writers = 6
    val rowsEach = 20
    val fs = (0 until writers).map { w =>
      Future(t.append((0 until rowsEach).map(i => s"w$w-$i").toDF("v")))
    }
    Await.result(Future.sequence(fs), 300.seconds)
    val ids = t.read().select("id").collect().map(_.getLong(0)).toSeq
    assert(ids.size == writers * rowsEach)
    assert(ids.distinct.size == ids.size,
      s"duplicate identity values: ${ids.groupBy(identity)
        .filter(_._2.size > 1).keys.toSeq.sorted.take(10)}")
    // the committed high-water covers the max id actually written
    assert(t.properties("graft.identity.id.highWater").toLong == ids.max)
  }

  test("MERGE INTO ... UPDATE SET * works on generated-column tables: " +
      "star expansion names the generated column, which recomputes " +
      "instead of refusing; a partial SET naming it still refuses") {
    setup
    spark.sql(s"""CREATE TABLE $cat.ns.star (
        k BIGINT, ts TIMESTAMP,
        day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))""")
    spark.sql(s"INSERT INTO $cat.ns.star VALUES " +
      "(1, TIMESTAMP'2024-01-01 10:00:00', DATE'2024-01-01')")
    // the source carries a WRONG day — star expansion assigns it, the
    // shed drops the assignment, and the recompute derives the truth
    val src = Seq((1L, java.sql.Timestamp.valueOf("2025-06-06 10:00:00"),
      java.sql.Date.valueOf("1999-01-01")))
      .toDF("k", "ts", "day").createOrReplaceTempView("star_src")
    spark.sql(s"""MERGE INTO $cat.ns.star t USING star_src s
      ON t.k = s.k WHEN MATCHED THEN UPDATE SET *""")
    assert(spark.sql(s"SELECT day FROM $cat.ns.star WHERE k = 1")
      .head().getDate(0).toString == "2025-06-06")
    // a PARTIAL set naming the generated column stays a refusal
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $cat.ns.star t USING star_src s
        ON t.k = s.k WHEN MATCHED THEN UPDATE SET day = s.day"""))
    def msgs(x: Throwable): Seq[String] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("generated column")), msgs(e).toString)
  }

  test("the V1 path-based writer and streaming sink fill generated " +
      "columns too (all batch planes funnel through append)") {
    val root = Files.createTempDirectory("graft-gencols-v1").toString
    val dir = root + "/t"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, ts TIMESTAMP, day DATE")
    val t = CommitLogTable.create(spark, dir, schema, Seq("day"))
    t.setProperties(Map("graft.generated.day" -> "CAST(ts AS DATE)"))
    // df.write.format("commitlog") without day
    Seq((1L, java.sql.Timestamp.valueOf("2024-06-01 08:00:00")))
      .toDF("k", "ts").write.format("commitlog")
      .mode("append").save(dir)
    // V1 streaming sink without day
    val src = root + "/src"
    Seq((2L, java.sql.Timestamp.valueOf("2024-06-02 08:00:00")))
      .toDF("k", "ts").write.parquet(src)
    val q = spark.readStream.schema(
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, ts TIMESTAMP"))
      .parquet(src).writeStream.format("commitlog")
      .option("path", dir).option("checkpointLocation", root + "/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    assert(t.read().orderBy("k").collect().map(_.getDate(2).toString).toSeq ==
      Seq("2024-06-01", "2024-06-02"))
    assert(t.resolvedManifest(None).files
      .map(_.partitionVals.head).sorted ==
      Seq("2024-06-01", "2024-06-02"))
  }
}
