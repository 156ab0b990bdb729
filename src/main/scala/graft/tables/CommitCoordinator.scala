package graft.tables

import java.util.UUID

import org.apache.spark.sql.SparkSession

/** Arbitration seam for commit-log publishes.
  *
  * [[CommitLogTable]]'s optimistic commit loop needs exactly one
  * property from storage: for a given manifest name, AT MOST ONE writer
  * across all processes materializes it and learns it won. On a POSIX
  * filesystem (and HDFS, ABFS, GCS-with-precondition, S3-with-
  * conditional-PUT) that primitive is atomic create-if-absent — the
  * default [[AtomicCreateCoordinator]], served per-scheme by the
  * [[Store]] seam (hard link locally, `FileContext` rename-no-overwrite
  * on Hadoop filesystems). Object stores WITHOUT it (plain S3 PUT
  * semantics: unconditional clobber) are exactly why Delta ships
  * pluggable LogStores / commit coordinators for S3 (the reference's
  * Bronze tables live on `s3://…`, bronze_prices_auto_loader.ipynb cell
  * 3) — for those, [[LeaseCoordinator]] arbitrates by claim-election
  * instead, needing only (a) PUTs to unique keys, (b) list-after-write
  * consistency, (c) a bounded visibility+clock-skew window.
  *
  * Select per session with `spark.graft.commit.coordinator` =
  * `atomic-create` (default) | `lease`; tests inject instances directly
  * via the `private[graft]` seam on [[CommitLogTable]].
  */
trait CommitCoordinator {

  /** Claim `name` inside `logDir`, materializing `payload` durably
    * BEFORE it becomes visible under that name. Returns true iff this
    * caller won: for any given `name`, at most one claimant may ever see
    * true, no matter how many processes race.
    */
  def tryClaim(logDir: GPath, name: String, payload: Array[Byte]): Boolean
}

object CommitCoordinator {

  /** Session-selected coordinator (`spark.graft.commit.coordinator`). */
  def forSession(spark: SparkSession): CommitCoordinator =
    spark.conf.getOption("spark.graft.commit.coordinator")
      .map(_.trim.toLowerCase) match {
      case None | Some("atomic-create") => AtomicCreateCoordinator
      case Some("lease") =>
        val settle = spark.conf
          .getOption("spark.graft.commit.lease.settleMillis")
          .map(_.toLong).getOrElse(50L)
        val lease = spark.conf
          .getOption("spark.graft.commit.lease.leaseMillis")
          .map(_.toLong).getOrElse(30000L)
        new LeaseCoordinator(settle, lease)
      case Some(other) => throw new IllegalArgumentException(
        s"spark.graft.commit.coordinator: unknown coordinator '$other' " +
          "(expected atomic-create or lease)")
    }
}

/** Default arbitration: one [[Store.claim]] — write the payload to a
  * synced temp file, then make it visible under the target name via the
  * store's atomic create-if-absent (hard link on local POSIX,
  * `FileContext.rename(NONE)` on HDFS-style filesystems; modern S3 maps
  * the same contract onto conditional PUT `If-None-Match: *`). Exactly
  * one racer avoids the already-exists signal.
  */
object AtomicCreateCoordinator extends CommitCoordinator {

  override def tryClaim(logDir: GPath, name: String,
      payload: Array[Byte]): Boolean =
    GFiles.claim(logDir.resolve(name), payload)
}

/** Lock-file/lease arbitration for stores WITHOUT atomic
  * create-if-absent. The claim protocol needs only object-store
  * primitives:
  *
  *   1. refuse if `name` is already materialized;
  *   2. PUT an intent entry under `.claims-<name>/<ts>-<uuid>` — unique
  *      key, so no clobber is possible;
  *   3. wait `settleMillis` (an upper bound on PUT→LIST visibility lag
  *      plus inter-writer clock skew);
  *   4. LIST the claims: the lexicographically smallest LIVE entry
  *      (age ≤ `leaseMillis`) wins — everyone else withdraws;
  *   5. the winner alone materializes `name` (a plain PUT is now safe:
  *      election gave it exclusivity) and sweeps the claim dir.
  *
  * Correctness assumption — stated, not hidden: exactly-once holds when
  * `settleMillis` really bounds visibility lag + clock skew, and the
  * winner PUTs within `leaseMillis` of its claim (a crashed winner's
  * claim expires so the version isn't bricked; an alive-but-slower-than-
  * the-lease winner could be doubled, the standard lease tradeoff —
  * size `leaseMillis` ≥ worst-case PUT latency). This is the
  * single-table analogue of Delta's S3 commit-coordinator move; where
  * the store DOES offer conditional PUT, prefer
  * [[AtomicCreateCoordinator]] semantics instead.
  */
final class LeaseCoordinator(settleMillis: Long = 50L,
    leaseMillis: Long = 30000L) extends CommitCoordinator {

  /** "PUT" emulation through the store seam: whole-object visibility
    * via temp + replace-move. The ARBITRATION never relies on this
    * move's atomicity — it is only the stand-in for an object store's
    * all-or-nothing PUT.
    */
  private def put(target: GPath, payload: Array[Byte]): Unit = {
    val tmp = target.getParent.resolve(s".put-${UUID.randomUUID()}")
    // a racer may prune the just-emptied claims dir between our
    // createDirectories and this write — recreate and retry once (object
    // stores have no dirs, so this is purely local-emulation plumbing)
    try GFiles.writeSync(tmp, payload)
    catch {
      case _: java.nio.file.NoSuchFileException =>
        GFiles.createDirectories(target.getParent)
        GFiles.writeSync(tmp, payload)
      case _: java.io.FileNotFoundException =>
        GFiles.createDirectories(target.getParent)
        GFiles.writeSync(tmp, payload)
    }
    GFiles.moveReplace(tmp, target)
  }

  override def tryClaim(logDir: GPath, name: String,
      payload: Array[Byte]): Boolean = {
    val target = logDir.resolve(name)
    if (GFiles.exists(target)) return false
    val claimsDir = logDir.resolve(s".claims-$name")
    GFiles.createDirectories(claimsDir)
    val myClaim = f"${System.currentTimeMillis()}%020d-${UUID.randomUUID()}"
    put(claimsDir.resolve(myClaim), Array.emptyByteArray)
    try {
      Thread.sleep(settleMillis)
      val now = System.currentTimeMillis()
      def live(n: String): Boolean =
        scala.util.Try(n.takeWhile(_ != '-').toLong).toOption
          .exists(ts => now - ts <= leaseMillis)
      val claims = GFiles.list(claimsDir).map(_.fileName)
        .filter(live).sorted
      if (claims.headOption.contains(myClaim) && !GFiles.exists(target)) {
        put(target, payload)
        true
      } else false
    } finally {
      // every claimant sweeps ONLY its own entry (sweeping others would
      // race a late claimant's PUT); the then-empty dir is pruned
      // best-effort, stragglers expire via the lease age
      try {
        GFiles.deleteIfExists(claimsDir.resolve(myClaim))
        GFiles.deleteIfExists(claimsDir)
      } catch { case _: java.io.IOException => () }
    }
  }
}
