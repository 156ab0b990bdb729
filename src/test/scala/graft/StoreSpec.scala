package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.{GFiles, GPath, HadoopStore, LocalStore, Store}

/** The storage seam ([[graft.tables.Store]]): GPath string algebra,
  * behavioral parity of the nio and Hadoop bindings over the same
  * local directory, and the atomic-create claim — the one primitive
  * the commit protocol rests on — exercised through the Hadoop
  * binding's `FileContext.rename(NONE)` path (Delta `HDFSLogStore`'s
  * published design), with the object-store refusal by name.
  */
class StoreSpec extends AnyFunSuite {
  TestSpark.spark // hadoop conf source for HadoopStore

  private def tmp(): String =
    Files.createTempDirectory("graft-store-spec").toString

  // ------------------------------------------------------------- GPath

  test("GPath: scheme detection and dispatch") {
    assert(GPath("/a/b").scheme == "")
    assert(GPath("file:/a/b").scheme == "file")
    assert(GPath("hdfs://nn:8020/a").scheme == "hdfs")
    assert(GPath("s3a://bucket/k").scheme == "s3a")
    // a relative path with a colon-ish name is NOT a scheme
    assert(GPath("a/b:c").scheme == "")
    assert(Store.of(GPath("/a/b")) eq LocalStore)
    assert(Store.of(GPath("file:/a/b")) eq HadoopStore)
    assert(Store.of(GPath("hdfs://nn/a")) eq HadoopStore)
  }

  test("GPath: join normalizes doubled separators but preserves authority") {
    assert(GPath("/a/", "b", "c/d").raw == "/a/b/c/d")
    assert(GPath("/a//b").raw == "/a/b")
    assert(GPath("file:///t/x//y").raw == "file:///t/x/y")
    assert(GPath("hdfs://nn:8020//a//b").raw == "hdfs://nn:8020/a/b")
    assert(GPath("s3a://bucket").raw == "s3a://bucket")
  }

  test("GPath: parent / fileName / resolve / relativize round-trip") {
    val p = GPath("file:/t/a").resolve("b").resolve("c.json")
    assert(p.raw == "file:/t/a/b/c.json")
    assert(p.fileName == "c.json")
    assert(p.getParent.raw == "file:/t/a/b")
    assert(GPath("file:/t/a").relativize(p) == "b/c.json")
    assert(p.startsWith(GPath("file:/t/a")))
    // a same-prefix SIBLING ("/t/ab" vs "/t/a/…") is not "under"
    intercept[IllegalArgumentException](GPath("file:/t/ab").relativize(p))
    assert(!p.startsWith(GPath("file:/t/ab")))
    assert(GPath.isAbsolute("/x") && GPath.isAbsolute("file:/x") &&
      GPath.isAbsolute("s3a://b/k") && !GPath.isAbsolute("data/c-1/f.parquet"))
  }

  // ----------------------------------------------- binding parity

  private def paritySuite(root: GPath): Unit = {
    val st = Store.of(root)
    val dir = root.resolve("d1").resolve("d2")
    st.createDirectories(dir)
    assert(st.isDirectory(dir) && !st.isRegularFile(dir))
    val f = dir.resolve("x.bin")
    st.write(f, Array[Byte](1, 2, 3, 4, 5), sync = true)
    assert(st.isRegularFile(f) && st.size(f) == 5L)
    assert(st.readAllBytes(f).toSeq == Seq[Byte](1, 2, 3, 4, 5))
    assert(st.readRange(f, 1L, 3).toSeq == Seq[Byte](2, 3, 4))
    assert(st.lastModifiedMillis(f) > 0L)
    // list sees the child by the caller's own path form
    assert(st.list(dir).map(_.raw) == Seq(f.raw))
    assert(st.walkFiles(root).map(_.raw) == Seq(f.raw))
    // batched status sweep: the file with a real mtime, both ancestor
    // dirs present, root excluded
    val sw = st.walkStatuses(root)
    assert(sw.map(e => (e.path.raw, e.isDir)).toSet ==
      Set((root.resolve("d1").raw, true), (dir.raw, true), (f.raw, false)))
    assert(sw.find(_.path.raw == f.raw).get.mtimeMillis > 0L)
    // a crashed writer's bare mkdirs — a FILE-LESS subtree, invisible
    // to a recursive file listing — is still discovered by the probe
    st.createDirectories(root.resolve("ghost").resolve("sub"))
    assert(st.walkStatuses(root).filter(_.isDir).map(_.path.raw).toSet ==
      Set(root.resolve("d1").raw, dir.raw, root.resolve("ghost").raw,
        root.resolve("ghost").resolve("sub").raw))
    st.deleteRecursively(root.resolve("ghost"))
    // moveNoReplace refuses an existing destination
    val g = dir.resolve("y.bin")
    st.moveNoReplace(f, g)
    st.write(f, Array[Byte](9), sync = false)
    intercept[java.nio.file.FileAlreadyExistsException](
      st.moveNoReplace(f, g))
    // moveReplace clobbers
    st.moveReplace(f, g)
    assert(st.readAllBytes(g).toSeq == Seq[Byte](9))
    assert(!st.exists(f))
    st.copyReplace(g, f)
    assert(st.readAllBytes(f).toSeq == Seq[Byte](9))
    // idempotent replace: identical destination bytes succeed with the
    // src consumed and the destination untouched; different bytes
    // replace as usual
    val h1 = dir.resolve("h1.bin")
    val h2 = dir.resolve("h2.bin")
    st.write(h1, Array[Byte](7, 7), sync = false)
    st.write(h2, Array[Byte](7, 7), sync = false)
    st.moveReplaceIdempotent(h1, h2)
    assert(!st.exists(h1) && st.readAllBytes(h2).toSeq == Seq[Byte](7, 7))
    st.write(h1, Array[Byte](8), sync = false)
    st.moveReplaceIdempotent(h1, h2)
    assert(!st.exists(h1) && st.readAllBytes(h2).toSeq == Seq[Byte](8))
    st.deleteIfExists(h2)
    assert(st.deleteIfExists(f) && !st.deleteIfExists(f))
    st.deleteRecursively(root.resolve("d1"))
    assert(!st.exists(dir))
  }

  test("LocalStore: IO contract over a bare path") {
    paritySuite(GPath(tmp()))
  }

  test("HadoopStore: same IO contract over a file: URI") {
    paritySuite(GPath("file:" + tmp()))
  }

  // ------------------------------------------------------------- claim

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

  test("claim through the Hadoop binding: exactly one winner, payload intact, no tmp debris") {
    val logDir = GPath("file:" + tmp())
    val wins = race(8)(i =>
      GFiles.claim(logDir.resolve("v1.json"), s"payload-$i".getBytes))
    assert(wins.count(identity) == 1)
    val got = new String(GFiles.readAllBytes(logDir.resolve("v1.json")))
    assert(got == s"payload-${wins.indexOf(true)}")
    // losers' temp files (and their checksum sidecars) are swept
    assert(GFiles.list(logDir).map(_.fileName) == Seq("v1.json"))
    // an already-materialized name refuses immediately
    assert(!GFiles.claim(logDir.resolve("v1.json"), "late".getBytes))
  }

  test("the lease coordinator arbitrates exactly-once over the Hadoop " +
      "binding too (the object-store path, file: as the double)") {
    val logDir = GPath("file:" + tmp())
    val coord = new graft.tables.LeaseCoordinator(settleMillis = 150)
    val wins = race(8)(i =>
      coord.tryClaim(logDir, "v1.json", s"payload-$i".getBytes))
    assert(wins.count(identity) == 1)
    val got = new String(GFiles.readAllBytes(logDir.resolve("v1.json")))
    assert(got == s"payload-${wins.indexOf(true)}")
    assert(!coord.tryClaim(logDir, "v1.json", "late".getBytes))
  }

  test("claim refuses non-atomic-rename schemes by name, pointing at the lease coordinator") {
    val e = intercept[IllegalStateException](
      HadoopStore.claim(GPath("s3a://bucket/_graft_log/v1.json"),
        "x".getBytes))
    assert(e.getMessage.contains("lease"))
  }
}
