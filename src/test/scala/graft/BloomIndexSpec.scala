package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.CommitLogTable

/** Per-file bloom-filter index (Delta's bloomFilterIndex analogue):
  * configured via TBLPROPERTIES, built as sidecars for every newly
  * written file, consulted by the central may-match prover for EQUALITY
  * probes — so point lookups on scattered high-cardinality keys prune
  * files where (min, max) stats cannot. Soundness: blooms have no false
  * negatives, so "definitely absent" never drops a live row.
  */
class BloomIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-bloom-spec").toString

  /** 8 single-file commits with INTERLEAVED keys (file j holds k where
    * k%8==j over 0..799): every file's (min, max) spans nearly the whole
    * key domain, so stats alone prune nothing.
    */
  private def buildBloomed(dir: String): CommitLogTable = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("tag", StringType), StructField("v", DoubleType)))
    val t = CommitLogTable.create(spark, dir, schema)
    t.setProperties(Map(CommitLogTable.BloomColsProp -> "k,tag"))
    (0 until 8).foreach { j =>
      t.append(spark.range(100)
        .select(($"id" * 8 + j).as("k"),
          concat(lit("t"), ($"id" * 8 + j).cast("string")).as("tag"),
          ($"id" * 1.0).as("v")).coalesce(1), recordChanges = false)
    }
    t
  }

  private def survivors(t: CommitLogTable, col: String, v: Any): Int = {
    val snap = t.resolvedManifest(None)
    snap.files.count(f => t.lazyDeleteMayMatch(snap, f, Some((col, "=", v))))
  }

  test("equality probe prunes to the single holding file where stats cannot") {
    val dir = tmpDir()
    val t = buildBloomed(dir)
    val snap = t.resolvedManifest(None)
    assert(snap.files.size == 8)
    assert(snap.files.forall(_.blooms.toSet == Set("k", "tag")))
    // stats alone keep everything: every file's k-range covers 17
    assert(snap.files.count(f =>
      f.stats.get("k").exists { case (mn, mx) =>
        mn.toLong <= 17L && 17L <= mx.toLong }) == 8)
    // bloom prunes to the one interleaved file that holds it
    assert(survivors(t, "k", 17L) == 1)
    assert(survivors(t, "tag", "t17") == 1)
    // a key nobody holds prunes everything
    assert(survivors(t, "k", 100000L) == 0)
    // no false negatives: every present key keeps its file reachable,
    // and the DSv2 read still finds the row
    (0L until 800L by 37L).foreach { kk =>
      assert(survivors(t, "k", kk) >= 1, s"k=$kk lost its file")
    }
    val hit = spark.read.format("commitlog").load(dir).filter($"k" === 17L)
    assert(hit.select($"tag").as[String].collect().toSeq == Seq("t17"))
    // range probes ignore blooms (they only answer equality)
    assert(survivors(t, "k", 17L) == 1)
    val range = t.readRange("k", 10L, 20L)
    assert(range.count() == 11)
    // IN-list pushdown prunes per member: 17%8 and 23%8 live in
    // different files → exactly 2 survive, and the read agrees
    assert(snap.files.count(f =>
      t.lazyDeleteMayMatch(snap, f, Some(("k", "in", Seq(17L, 23L))))) == 2)
    assert(spark.read.format("commitlog").load(dir)
      .filter($"k".isin(17L, 23L)).count() == 2)
  }

  test("unsupported/unbloomd columns and nulls never consult a bloom") {
    val dir = tmpDir()
    val t = buildBloomed(dir)
    // v is DoubleType — never bloomed, prover keeps all (modulo stats)
    assert(survivors(t, "v", 0.0) == 8)
    assert(survivors(t, "k", null) == 8)
  }

  test("files written before the property have no blooms; rewrite backfills") {
    import org.apache.spark.sql.types._
    val dir = tmpDir()
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType)))
    val t = CommitLogTable.create(spark, dir, schema)
    // two undersized files, so the bin-pack compact below really rewrites
    t.append(spark.range(50).select(($"id" * 7 % 100).as("k"), $"id".as("v"))
      .coalesce(1), recordChanges = false)
    t.append(spark.range(50, 100).select(($"id" * 7 % 100).as("k"), $"id".as("v"))
      .coalesce(1), recordChanges = false)
    assert(t.resolvedManifest(None).files.forall(_.blooms.isEmpty))
    t.setProperties(Map(CommitLogTable.BloomColsProp -> "k"))
    // pre-property files: no bloom, equality keeps them (stats permitting)
    assert(survivors(t, "k", 3L) == 2)
    // compact rewrites the files → blooms appear
    t.compact(256L * 1024 * 1024)
    val snap = t.resolvedManifest(None)
    assert(snap.files.nonEmpty && snap.files.forall(_.blooms == Seq("k")))
    assert(survivors(t, "k", 1000L) == 0)
  }

  test("schema evolution: a pre-evolution file's empty bloom prunes every probe") {
    import org.apache.spark.sql.types._
    val dir = tmpDir()
    val schema = StructType(Seq(StructField("k", LongType)))
    val t = CommitLogTable.create(spark, dir, schema)
    t.setProperties(Map(CommitLogTable.BloomColsProp -> "k,extra"))
    t.append(spark.range(10).select($"id".as("k")).coalesce(1),
      recordChanges = false)
    t.append(spark.range(10, 20)
      .select($"id".as("k"), concat(lit("e"), $"id".cast("string")).as("extra"))
      .coalesce(1), mergeSchema = true, recordChanges = false)
    // probing extra="e15": the pre-evolution file is all-NULL there —
    // its (post-evolution commit has no bloom for it, it predates the
    // column) — but the second file holds it
    assert(survivors(t, "extra", "e15") >= 1)
    assert(spark.read.format("commitlog").load(dir)
      .filter($"extra" === "e15").count() == 1)
    // a value nobody has: only the pre-evolution file (bloomless for
    // `extra`) can survive
    assert(survivors(t, "extra", "nope") <= 1)
  }

  test("vacuum removes a dead file's bloom sidecars with it") {
    val dir = tmpDir()
    val t = buildBloomed(dir)
    def sidecars(): Seq[String] = {
      val s = Files.walk(Paths.get(dir))
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("_bloom."))
        .map(_.toString).toVector
      finally s.close()
    }
    assert(sidecars().size == 16) // 8 files × 2 columns
    t.compact(256L * 1024 * 1024) // supersedes the 8 originals with 1 clustered file
    t.vacuum(retainVersions = 1, orphanGraceMillis = 0L)
    val left = sidecars()
    // only the compacted file's sidecars remain
    assert(left.size == 2, left.mkString(","))
    assert(survivors(t, "k", 17L) == 1)
  }
}
