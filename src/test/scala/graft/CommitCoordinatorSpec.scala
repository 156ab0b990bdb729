package graft

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.{AtomicCreateCoordinator, CommitCoordinator, CommitLogTable, GPath, LeaseCoordinator}

/** Publish arbitration ([[graft.tables.CommitCoordinator]]): the
  * commit log needs at-most-one-winner per manifest name across
  * processes. These specs show (1) WHY the seam exists — a deliberately
  * non-atomic check-then-put publish loses updates under a forced race,
  * exactly the plain-S3 failure Delta's LogStores guard against; (2)
  * that both shipped coordinators arbitrate exactly-once under the same
  * forced race; (3) that the lease protocol's liveness holds (a crashed
  * claimant's stale entry expires instead of bricking the version).
  */
class CommitCoordinatorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-coordinator-spec").toString

  /** Seam-path form of a nio path (the spec drives both). */
  private def g(p: Path): GPath = GPath(p.toString)

  /** The broken primitive: existence check, then unconditional PUT —
    * what a naive writer does on an object store without conditional
    * writes. The barrier forces every racer past the check before any
    * PUT lands, making the lost update deterministic.
    */
  private final class NonAtomicCoordinator(barrier: CyclicBarrier)
      extends CommitCoordinator {
    override def tryClaim(logDir: GPath, name: String,
        payload: Array[Byte]): Boolean = {
      val t = Paths.get(logDir.raw).resolve(name)
      if (Files.exists(t)) return false
      barrier.await(20, TimeUnit.SECONDS)
      Files.write(t, payload) // clobbers a racer's PUT
      true
    }
  }

  private def race[T](n: Int)(body: Int => T): Seq[T] = {
    val pool = Executors.newFixedThreadPool(n)
    try {
      val go = new CountDownLatch(1)
      val fs = (0 until n).map(i => pool.submit(
        new java.util.concurrent.Callable[T] {
          override def call(): T = { go.await(); body(i) }
        }))
      go.countDown()
      fs.map(_.get(60, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  test("a non-atomic check-then-put publish double-wins under a forced race") {
    val logDir = Paths.get(tmpDir())
    val barrier = new CyclicBarrier(2)
    val shim = new NonAtomicCoordinator(barrier)
    val wins = race(2)(i =>
      shim.tryClaim(g(logDir), "v1.json", s"payload-$i".getBytes))
    assert(wins.count(identity) == 2,
      "the broken primitive must double-win — that IS the demonstrated bug")
  }

  test("AtomicCreateCoordinator: exactly one winner among simultaneous claimants") {
    val logDir = Paths.get(tmpDir())
    val wins = race(8)(i =>
      AtomicCreateCoordinator.tryClaim(g(logDir), "v1.json",
        s"payload-$i".getBytes))
    assert(wins.count(identity) == 1)
    // and the materialized payload is the winner's, intact
    val got = new String(Files.readAllBytes(logDir.resolve("v1.json")))
    assert(got == s"payload-${wins.indexOf(true)}")
  }

  test("LeaseCoordinator: exactly one winner among simultaneous claimants") {
    val logDir = Paths.get(tmpDir())
    val coord = new LeaseCoordinator(settleMillis = 150)
    val wins = race(8)(i =>
      coord.tryClaim(g(logDir), "v1.json", s"payload-$i".getBytes))
    assert(wins.count(identity) == 1)
    val got = new String(Files.readAllBytes(logDir.resolve("v1.json")))
    assert(got == s"payload-${wins.indexOf(true)}")
    // an already-materialized name refuses immediately
    assert(!coord.tryClaim(g(logDir), "v1.json", "late".getBytes))
  }

  test("LeaseCoordinator liveness: a crashed claimant's stale entry expires, not bricks") {
    val logDir = Paths.get(tmpDir())
    val claims = logDir.resolve(".claims-v1.json")
    Files.createDirectories(claims)
    // a dead writer's claim, older than the lease — lexicographically
    // smallest forever, so without expiry no one could ever win
    val staleTs = System.currentTimeMillis() - 120000L
    Files.write(claims.resolve(f"$staleTs%020d-dead"), Array.emptyByteArray)
    val coord = new LeaseCoordinator(settleMillis = 20, leaseMillis = 30000)
    assert(coord.tryClaim(g(logDir), "v1.json", "alive".getBytes))
  }

  test("end-to-end: racing appends lose an update under the broken shim, never under the coordinators") {
    // --- the disease: both appends claim v1, the manifest PUT clobbers
    val dirBad = tmpDir() + "/t"
    val schema = Seq((0L, "seed")).toDF("k", "who").schema
    CommitLogTable.create(spark, dirBad, schema)
    val barrier = new CyclicBarrier(2)
    race(2) { i =>
      val t = CommitLogTable.open(spark, dirBad)
      t.coordinator = new NonAtomicCoordinator(barrier)
      t.append(Seq((i.toLong, s"writer$i")).toDF("k", "who"),
        recordChanges = false)
    }
    val survivors = CommitLogTable.open(spark, dirBad).read()
      .select("who").as[String].collect().toSet
    assert(survivors.size == 1,
      s"check-then-put must lose one writer's commit, got $survivors")

    // --- the cure, same forced overlap: every batch lands exactly once
    for (mk <- Seq(() => AtomicCreateCoordinator,
        () => new LeaseCoordinator(settleMillis = 50))) {
      val dir = tmpDir() + "/t"
      CommitLogTable.create(spark, dir, schema)
      race(2) { i =>
        val t = CommitLogTable.open(spark, dir)
        t.coordinator = mk()
        t.append(Seq((i.toLong, s"writer$i")).toDF("k", "who"),
          recordChanges = false)
      }
      val t = CommitLogTable.open(spark, dir)
      assert(t.read().select("who").as[String].collect().toSet ==
        Set("writer0", "writer1"))
      assert(t.latestVersion == 2L, "one commit per writer")
    }
  }

  test("session conf selects the coordinator; lease-coordinated tables run the full surface") {
    spark.conf.set("spark.graft.commit.coordinator", "lease")
    spark.conf.set("spark.graft.commit.lease.settleMillis", "10")
    try {
      val dir = tmpDir() + "/t"
      val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      val t = CommitLogTable.create(spark, dir, df.schema)
      assert(t.coordinator.isInstanceOf[LeaseCoordinator])
      t.append(df)
      t.delete(org.apache.spark.sql.functions.expr("k = 1"))
      assert(t.read().select("s").as[String].collect().toSeq == Seq("b"))
      assert(t.history.collect().length == 3)
    } finally {
      spark.conf.unset("spark.graft.commit.coordinator")
      spark.conf.unset("spark.graft.commit.lease.settleMillis")
    }
  }
}
