package graft

import java.nio.file.Files

/** The ENTIRE CommitLogSpec suite re-run with every table rooted at a
  * `file:` URI — which the storage seam routes through the Hadoop
  * `FileSystem` binding ([[graft.tables.HadoopStore]]), Spark's bundled
  * `LocalFileSystem` standing in for HDFS in this zero-egress sandbox.
  * Green here means the table format's whole metadata plane (manifest
  * claims via `FileContext.rename(NONE)`, change-file promotion, hint
  * files, vacuum sweeps, clones, the cross-JVM commit race) works
  * against the Hadoop API surface a cluster filesystem exposes — the
  * deployment shape a 100 TB lake actually has (the reference's tables
  * live on S3, `docs/databricks_setup.md:75-100`).
  */
class CommitLogHadoopStoreSpec extends CommitLogSpec {
  override protected def tmpDir(): String =
    "file:" + Files.createTempDirectory("graft-commitlog-hadoop").toString
}
