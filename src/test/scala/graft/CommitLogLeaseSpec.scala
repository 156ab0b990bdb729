package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll

/** The ENTIRE CommitLogSpec suite re-run with every table rooted at a
  * `file:` URI AND every publish arbitrated by the LEASE coordinator
  * (`spark.graft.commit.coordinator=lease`) instead of the store's
  * atomic create — the exact deployment shape of an object store
  * without conditional PUT (plain S3), where [[graft.tables
  * .HadoopStore.claim]] refuses by scheme and the claim-election
  * protocol of [[graft.tables.LeaseCoordinator]] carries commits.
  * Green here means the whole metadata plane — rebase/recompute commit
  * races, merge/optimize/vacuum, clones, CDF, and the cross-JVM race
  * (the second process receives the lease conf as `spark.*` system
  * properties) — holds when exactly-once comes from lease election
  * rather than an atomic-create primitive.
  */
class CommitLogLeaseSpec extends CommitLogSpec with BeforeAndAfterAll {

  override protected def tmpDir(): String =
    "file:" + Files.createTempDirectory("graft-commitlog-lease").toString

  override protected def raceJvmFlags: Seq[String] = Seq(
    "-Dspark.graft.commit.coordinator=lease",
    "-Dspark.graft.commit.lease.settleMillis=25")

  override def beforeAll(): Unit = {
    super.beforeAll()
    TestSpark.spark.conf.set("spark.graft.commit.coordinator", "lease")
    // local fs visibility is instant; a short settle keeps the suite
    // fast while still exercising the election window
    TestSpark.spark.conf.set("spark.graft.commit.lease.settleMillis", "25")
  }

  override def afterAll(): Unit = {
    // the session is shared across suites in the forked JVM — restore
    // the default coordinator so later suites run atomic-create
    TestSpark.spark.conf.unset("spark.graft.commit.coordinator")
    TestSpark.spark.conf.unset("spark.graft.commit.lease.settleMillis")
    super.afterAll()
  }
}
