package graft.delta

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Per-version `.crc` checksums: written after every commit, validated on
  * replay — including checksums a foreign writer recorded. */
class ChecksumSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("every commit shape writes a .crc the replay validates against") {
    val dir = tempTable("crc-write").toString
    GraftWriter.write((0 until 20).map(i => (i.toLong, "a")).toDF("id", "v"), dir)
    GraftWriter.write(Seq((99L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    Dml.delete(spark, dir, col("id") < 5)
    DeltaTable.forPath(spark, dir).setDomainMetadata("d", "c")
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update() // validates each refresh step
    log.listCommitVersions().foreach { v =>
      assert(Files.exists(Paths.get(dir, "_delta_log", f"$v%020d.crc")),
        s"version $v must have a checksum")
    }
    val crc = Checksum.read(log, snap.version).get
    assert(crc.numFiles == snap.files.size)
    assert(crc.tableSizeBytes == snap.files.map(_.size).sum)
    assert(crc.domainMetadata.contains(Map("d" -> "c")))
  }

  /** Overwrite a log file BEHIND Hadoop's LocalFileSystem, which keeps
    * its own `.name.crc` integrity sidecars — without dropping the
    * sidecar the new content fails Hadoop's checksum and reads as
    * missing, which would vacuously pass these tests. */
  private def overwriteBehindHadoop(dir: String, name: String, content: String): Unit = {
    Files.writeString(Paths.get(dir, "_delta_log", name), content)
    Files.deleteIfExists(Paths.get(dir, "_delta_log", s".$name.crc"))
  }

  test("a mismatching checksum fails the refresh loudly") {
    val dir = tempTable("crc-mismatch").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    val v = log.update().version
    // a foreign writer's bookkeeping disagrees with what replay will find
    overwriteBehindHadoop(dir, f"$v%020d.crc",
      """{"tableSizeBytes":1,"numFiles":42,"numMetadata":1,"numProtocol":1}""")
    // forPathUncached: the claim is the COLD refresh validates — the r17
    // shared-handle cache would serve the warm snapshot and never re-validate
    val e = intercept[IllegalStateException](DeltaLog.forPathUncached(spark, dir).update())
    assert(e.getMessage.contains("checksum mismatch"))
    assert(e.getMessage.contains("numFiles=42"))
  }

  test("absence and garbage are tolerated; expired checksums are cleaned up") {
    val dir = tempTable("crc-tolerant").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    val v = log.update().version
    val crcPath = Paths.get(dir, "_delta_log", f"$v%020d.crc")
    Files.delete(crcPath)
    assert(DeltaLog.forPathUncached(spark, dir).update().version == v) // absent: fine
    overwriteBehindHadoop(dir, f"$v%020d.crc", "not json at all {{{")
    assert(DeltaLog.forPathUncached(spark, dir).update().version == v) // garbage: fine

    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    val log2 = DeltaLog.forPath(spark, dir)
    log2.update()
    log2.checkpoint()
    val deleted = log2.cleanUpExpiredLogs(log2.snapshot.version, retentionMillis = -1000)
    assert(deleted.contains(f"$v%020d.crc"))
  }

  test("pinned historical snapshots validate against their version's checksum") {
    val dir = tempTable("crc-pinned").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)          // v0
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append) // v1
    val log = DeltaLog.forPath(spark, dir)
    assert(log.snapshotForVersion(0).files.size == 1)
    // corrupt v0's crc: the pinned load must refuse
    overwriteBehindHadoop(dir, f"${0L}%020d.crc",
      """{"tableSizeBytes":0,"numFiles":7}""")
    val e = intercept[IllegalStateException](
      DeltaLog.forPath(spark, dir).snapshotForVersion(0))
    assert(e.getMessage.contains("checksum mismatch"))
  }
}
