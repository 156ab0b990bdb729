package graft

import org.apache.spark.sql.functions._

/** Scale evidence for the commit-log table format's METADATA operations
  * (`tables/CommitLogTable`): builds a partitioned table at two file-count
  * scales (default 64 and 640 partitions — a 10× manifest) and times each
  * table-service op at both. The claim under test is the one that matters
  * at 100 TB: schema evolution, rename, drop, the empty-merge guard, and
  * history are O(manifest) — one small JSON read/write — and a pruned
  * merge or partition read is O(touched partitions), while only the full
  * append/compact scale with the data. A 10× manifest should move the
  * metadata ops by far less than 10× (they are dominated by fixed
  * driver-side costs); a data-proportional op that failed to prune would
  * show ~10×.
  *
  * Usage: `tools/run.sh graft.TableFormatProbe /tmp/tfprobe [64,640]`
  * Prints one JSON line per (scale, op) with wall millis, plus a summary
  * ratio line per op.
  */
object TableFormatProbe {

  def main(args: Array[String]): Unit = {
    val outRoot = args.headOption.getOrElse("/tmp/graft-tableformat-probe")
    val scales = args.lift(1).getOrElse("64,640").split(',').map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-tf-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.tables.CommitLogTable

    def timeMs[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e6)
    }

    val results = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Double)]
    def rec(scale: Int, op: String, ms: Double): Unit = {
      results += ((scale, op, ms))
      println(f"""{"scale":$scale,"op":"$op","ms":${math.rint(ms * 10) / 10}%s}""")
    }

    for (p <- scales) {
      val dir = s"$outRoot/t$p-${System.nanoTime()}"
      // 200 rows per partition — small data on purpose: the probe isolates
      // metadata cost, so data volume must not dominate any op under test
      val df = spark.range(p * 200L).select(
        col("id").as("k"),
        (col("id") % p).cast("string").as("part"),
        ((col("id") * 7 % 1000) / 10.0).as("v"))
      val t = CommitLogTable.create(spark, dir, df.schema, Seq("part"))
      rec(p, "append_full", timeMs(t.append(df, recordChanges = false))._2)

      // snapshot resolution + plan only (no execution): the reader-side
      // cost of the manifest being the file index
      rec(p, "resolve_plan", timeMs(t.read().queryExecution.executedPlan)._2)
      rec(p, "history", timeMs(t.history.collect())._2)

      // metadata-only ops — the 100 TB "rename without rewrite" claims
      rec(p, "rename_column", timeMs(t.renameColumn("v", "amount"))._2)
      val evo = spark.range(5).select(col("id").as("k"),
        lit("0").as("part"), (col("id") * 1.0).as("amount"),
        lit("x").as("tag"))
      rec(p, "evolve_append_1part", timeMs(t.append(evo, mergeSchema = true))._2)
      rec(p, "drop_column", timeMs(t.dropColumn("tag"))._2)

      // the idle-stream guard: an empty upsert must cost ~nothing and
      // publish nothing (schema validation still runs first — the batch
      // speaks the current post-rename schema)
      val empty = spark.range(0).select(col("id").as("k"),
        lit("0").as("part"), lit(0.0).as("amount"))
      rec(p, "empty_merge_noop", timeMs(t.merge(empty, Seq("k", "part"), Seq(col("amount"))))._2)

      // partition-pruned paths: cost tracks the TOUCHED partition, not p
      val one = spark.range(3).select((col("id") + 1000000L).as("k"),
        lit("3").as("part"), lit(1.5).as("amount"))
      rec(p, "pruned_merge_1part", timeMs(t.merge(one, Seq("k", "part"), Seq(col("amount"))))._2)
      rec(p, "read_1partition", timeMs(t.readPartitions(Set("3")).count())._2)

      // stats skipping on a range-clustered UNPARTITIONED table: p files
      // with disjoint contiguous k ranges — a narrow range resolves to
      // ~1 file on manifest stats alone, while the full scan pays all p
      val sdir = s"$outRoot/s$p-${System.nanoTime()}"
      val clustered = spark.range(p * 200L).select(col("id").as("k"),
        (col("id") * 0.1).as("x"))
        .repartitionByRange(p, col("k")).sortWithinPartitions("k")
      val ts = CommitLogTable.create(spark, sdir, clustered.schema)
      ts.append(clustered, recordChanges = false)
      rec(p, "read_range_narrow",
        timeMs(ts.readRange("k", 10L, 20L).count())._2)
      rec(p, "read_full_scan", timeMs(ts.read().count())._2)
      // txn replay skip is pure metadata (no data written)
      t.append(one, txn = Some(("probe", 1L)))
      rec(p, "txn_replay_skip", timeMs(t.append(df, txn = Some(("probe", 1L))))._2)
      // merge-on-read delete and shallow clone: one manifest write each,
      // regardless of table size
      rec(p, "lazy_delete", timeMs(t.deleteLazy("k < 10"))._2)
      rec(p, "shallow_clone",
        timeMs(t.shallowCloneTo(s"$outRoot/clone$p-${System.nanoTime()}"))._2)
      // constraint management is metadata + one scan on add
      rec(p, "add_constraint", timeMs(t.addConstraint("k_pos", "k >= 0"))._2)
      rec(p, "validated_append_1part", timeMs(t.append(
        spark.range(3).select((col("id") + 2000000L).as("k"),
          lit("5").as("part"), lit(2.5).as("amount"))))._2)
      rec(p, "drop_constraint", timeMs(t.dropConstraint("k_pos"))._2)

      rec(p, "vacuum", timeMs(t.vacuum(retainVersions = 2, orphanGraceMillis = 0L))._2)
    }

    // ---- COMPOSITE-KEY axis (round 13, Manifest.partitionCols): the
    // same O(touched)/O(manifest) claims must hold when the partition
    // key is a TUPLE — (endpoint, dt) at 8 × p/8 leaves. The grouped
    // metadata aggregate answers from per-file partition tuples (zero
    // data files), a keyed merge rewrites one LEAF, and OPTIMIZE WHERE
    // compacts one leaf — none may track total leaf count.
    for (p <- scales) {
      val dir = s"$outRoot/mp$p-${System.nanoTime()}"
      val dts = math.max(1, p / 8)
      val df = spark.range(p * 200L).select(
        col("id").as("k"),
        (col("id") % 8).cast("string").as("ep"),
        (col("id") % dts).cast("string").as("dt"),
        ((col("id") * 7 % 1000) / 10.0).as("v"))
      val t = CommitLogTable.create(spark, dir, df.schema, Seq("ep", "dt"))
      rec(p, "mp_build_append", timeMs(t.append(df, recordChanges = false))._2)
      rec(p, "mp_grouped_agg_meta", timeMs(
        spark.read.format("commitlog").load(dir)
          .groupBy(col("ep"), col("dt")).agg(count(lit(1))).count())._2)
      val one = spark.range(3).select((col("id") + 1000000L).as("k"),
        lit("3").as("ep"), lit("0").as("dt"), lit(1.5).as("v"))
      rec(p, "mp_pruned_merge_1leaf",
        timeMs(t.merge(one, Seq("k", "ep", "dt"), Seq(col("v"))))._2)
      rec(p, "mp_optimize_where_1leaf", timeMs(
        t.compact(128L * 1024 * 1024,
          values = Some(t.partitionKeysWhere("ep = '3' AND dt = '0'"))))._2)
    }

    // ---- FILE-COUNT axis (checkpointed log): a metadata-only commit on
    // the diff-serialized log must cost O(diff) — flat wall time AND flat
    // manifest bytes while the live file count grows 100×. Before the
    // checkpointed log every commit serialized the full O(#files) list;
    // these rows are the evidence that cost is gone.
    val fileScales = args.lift(2).getOrElse("64,6400")
      .split(',').map(_.trim.toInt).toSeq
    for (fc <- fileScales) {
      val dir = s"$outRoot/f$fc-${System.nanoTime()}"
      val df = spark.range(fc * 10L).select(col("id").as("k"),
        (col("id") * 0.5).as("v")).repartition(fc)
      val t = CommitLogTable.create(spark, dir, df.schema)
      rec(fc, "files_build_append", timeMs(t.append(df, recordChanges = false))._2)
      val one = spark.range(1).select((col("id") + 10000000L).as("k"),
        lit(0.0).as("v")).coalesce(1)
      rec(fc, "files_append_1file",
        timeMs(t.append(one, recordChanges = false))._2)
      rec(fc, "files_rename", timeMs(t.renameColumn("v", "w"))._2)
      rec(fc, "files_set_property",
        timeMs(t.setProperties(Map("owner" -> "probe")))._2)
      rec(fc, "files_lazy_delete", timeMs(t.deleteLazy("k < 5"))._2)
      // round 14: convert's adoption probe (PAR1 magic + footer stats)
      // runs as a SPARK JOB — wall time may grow with the file count but
      // ms-per-file must stay ~flat (the I/O distributes across cores),
      // never the superlinear driver-serialized walk it replaced
      val cdir = s"$outRoot/cv$fc-${System.nanoTime()}"
      spark.range(fc * 10L).select(col("id").as("k"),
        (col("id") * 0.5).as("v")).repartition(fc).write.parquet(cdir)
      rec(fc, "convert_adopt",
        timeMs(CommitLogTable.convert(spark, cdir))._2)
      def manifestBytes(v: Long): Long =
        graft.tables.GFiles.size(
          graft.tables.GPath(dir, "_graft_log", f"v$v%020d.json"))
      rec(fc, "files_meta_manifest_bytes",
        manifestBytes(t.latestVersion).toDouble)
      // cold MANIFEST resolve from a fresh instance: one checkpoint read
      // + ≤ CheckpointInterval diff replays — this is the log's cost and
      // must stay ~flat. (Plan construction over the resolved file list —
      // Spark's FileIndex — is file-count-proportional by nature and is
      // tracked separately as resolve_plan on the partition axis.)
      rec(fc, "files_cold_manifest", timeMs(
        CommitLogTable.open(spark, dir).fileCount())._2)
      rec(fc, "files_cold_plan", timeMs(
        CommitLogTable.open(spark, dir).read().queryExecution.executedPlan)._2)
      // streaming admission is O(new commits), not O(table files): a
      // data-stream source resuming at the head admits one appended
      // file by reading that commit's raw DIFF manifest alone — flat
      // while the table's live file count grows 100×
      val sv = t.latestVersion + 1
      val src = new graft.sources.CommitLogStreamSource(spark, dir,
        Map("startingVersion" -> sv.toString))
      val one2 = spark.range(1).select((col("id") + 20000000L).as("k"),
        lit(1.0).as("w")).coalesce(1)
      t.append(one2, recordChanges = false)
      rec(fc, "files_stream_admit_1file",
        timeMs(src.latestOffset(null, src.getDefaultReadLimit))._2)
    }

    // per-op scale ratio across whichever two scales the op ran at:
    // metadata ops should sit far below the scale factor; only the
    // build/full appends are licensed to track it
    val byOp = results.groupBy(_._2)
    println("op,base_ms,scaled_ms,ratio")
    byOp.toSeq.sortBy(_._1).foreach { case (op, rows) =>
      val sorted = rows.sortBy(_._1)
      if (sorted.size >= 2) {
        val ma = sorted.head._3
        val mb = sorted.last._3
        println(f"$op,${math.rint(ma * 10) / 10}%s,${math.rint(mb * 10) / 10}%s,${math.rint(mb / ma * 100) / 100}%s")
      }
    }
    spark.stop()
  }
}
