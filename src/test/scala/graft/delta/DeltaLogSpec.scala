package graft.delta

import java.nio.file.{Files, Path => JPath, Paths}
import java.nio.file.attribute.FileTime

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

object LogFixtures {
  /** Write one raw commit file `%020d.json`. */
  def writeCommit(tableDir: JPath, version: Long, lines: Seq[String]): JPath = {
    val logDir = tableDir.resolve("_delta_log")
    Files.createDirectories(logDir)
    val f = logDir.resolve(f"$version%020d.json")
    Files.writeString(f, lines.mkString("\n"))
    f
  }

  def setCommitTime(tableDir: JPath, version: Long, millis: Long): Unit =
    Files.setLastModifiedTime(
      tableDir.resolve("_delta_log").resolve(f"$version%020d.json"),
      FileTime.fromMillis(millis))

  val schemaString: String =
    """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""

  def protocol: String = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
  def metaData: String =
    s"""{"metaData":{"id":"11111111-2222-3333-4444-555555555555","format":{"provider":"parquet","options":{}},"schemaString":"$schemaString","partitionColumns":[],"configuration":{},"createdTime":1587968585000}}"""
  def add(path: String, size: Long = 400): String =
    s"""{"add":{"path":"$path","partitionValues":{},"size":$size,"modificationTime":1587968586000,"dataChange":true}}"""
  def remove(path: String, ts: Long = 1587968596250L): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":$ts,"dataChange":true}}"""

  def tempTable(name: String): JPath =
    Files.createTempDirectory(s"graft-$name-")
}

class DeltaLogSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures._

  test("empty directory is NotATable (read_error_test.rs:5-14)") {
    val dir = tempTable("empty")
    intercept[NotATableException] { DeltaTable.forPath(spark, dir.toString) }
  }

  test("multi-version replay: file lists per version (read_delta_test.rs:52-95 shape)") {
    val dir = tempTable("versions")
    writeCommit(dir, 0, Seq(protocol, metaData, add("f0.parquet"), add("f1.parquet")))
    writeCommit(dir, 1, Seq(remove("f0.parquet"), add("f2.parquet")))
    writeCommit(dir, 2, Seq(add("f3.parquet")))
    writeCommit(dir, 3, Seq(remove("f1.parquet")))

    val log = DeltaLog.forPath(spark, dir.toString)
    val snap = log.update()
    assert(snap.version == 3)
    assert(snap.files.map(_.path).toSet == Set("f2.parquet", "f3.parquet"))
    assert(snap.tombstones.map(_.path).toSet == Set("f0.parquet", "f1.parquet"))
    assert(snap.minReaderVersion == 1 && snap.minWriterVersion == 2)

    assert(log.snapshotForVersion(0).files.map(_.path).toSet == Set("f0.parquet", "f1.parquet"))
    assert(log.snapshotForVersion(1).files.map(_.path).toSet == Set("f1.parquet", "f2.parquet"))
    assert(log.snapshotForVersion(2).files.map(_.path).toSet == Set("f1.parquet", "f2.parquet", "f3.parquet"))
    intercept[VersionNotFoundException] { log.snapshotForVersion(99) }
  }

  test("re-deleting the same path keeps ONE tombstone (latest wins)") {
    // DV DML remove+re-adds the same path every cycle; without per-path
    // dedup the tombstone list — and every future checkpoint — grows by
    // one entry per cycle forever
    val dir = tempTable("log-retombstone")
    writeCommit(dir, 0, Seq(protocol, metaData, add("f0.parquet")))
    writeCommit(dir, 1, Seq(remove("f0.parquet", ts = 1000L), add("f0.parquet")))
    writeCommit(dir, 2, Seq(remove("f0.parquet", ts = 2000L), add("f0.parquet")))
    writeCommit(dir, 3, Seq(remove("f0.parquet", ts = 3000L), add("f0.parquet")))
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.files.map(_.path) == Vector("f0.parquet"))
    assert(snap.tombstones.size == 1)
    assert(snap.tombstones.head.deletionTimestamp == 3000L)
  }

  test("simple_table golden shape: 5 active files, 31 tombstones (read_simple_table_test.rs:9-60)") {
    val dir = tempTable("simple")
    val all = (0 until 36).map(i => f"part-$i%05d.parquet")
    writeCommit(dir, 0, Seq(protocol, metaData) ++ all.map(add(_)))
    writeCommit(dir, 1, all.take(31).map(remove(_)))
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.files.size == 5)
    assert(snap.tombstones.size == 31)
    assert(snap.files.map(_.path).toSet == all.drop(31).toSet)
  }

  test("incremental update replays only new commits") {
    val dir = tempTable("incr")
    writeCommit(dir, 0, Seq(protocol, metaData, add("f0.parquet")))
    val log = DeltaLog.forPath(spark, dir.toString)
    assert(log.update().version == 0)
    writeCommit(dir, 1, Seq(add("f1.parquet")))
    val snap = log.update()
    assert(snap.version == 1)
    assert(snap.files.size == 2)
  }

  test("snapshot state holds O(1) commitInfos; history still serves every commit") {
    // Regression (r6 verdict #3): state used to accumulate EVERY historical
    // commitInfo — dead driver weight on every load at 100k-commit scale,
    // and silently truncated after a checkpoint restore anyway (checkpoints
    // carry no commitInfo actions). State now keeps only the latest;
    // history reads the commit files on demand.
    val dir = tempTable("cinfo-bound")
    def info(op: String): String = s"""{"commitInfo":{"operation":"$op"}}"""
    writeCommit(dir, 0, Seq(protocol, metaData, add("f0.parquet"), info("op0")))
    (1 until 200).foreach(v =>
      writeCommit(dir, v, Seq(add(s"f$v.parquet"), info(s"op$v"))))
    val log = DeltaLog.forPath(spark, dir.toString)
    val snap = log.update()
    assert(snap.version == 199)
    assert(snap.lastCommitInfo.map(_.get("operation").asText).contains("op199"))
    // full provenance, newest last, straight from the log
    val hist = new DeltaTable(log, snap).history
    assert(hist.size == 200)
    assert(hist.map(_.get("operation").asText) == (0 until 200).map(i => s"op$i"))
    // a version-pinned handle reports provenance only up to its pin —
    // commits after a time-travel snapshot must stay invisible (r7 ADVICE)
    val pinned = DeltaTable.forPath(spark, dir.toString, 49).history
    assert(pinned.size == 50)
    assert(pinned.map(_.get("operation").asText) == (0 until 50).map(i => s"op$i"))
  }

  test("time travel by timestamp: binary search on commit mtimes (delta.rs:1041-1075)") {
    val dir = tempTable("ts")
    writeCommit(dir, 0, Seq(protocol, metaData, add("f0.parquet")))
    writeCommit(dir, 1, Seq(add("f1.parquet")))
    writeCommit(dir, 2, Seq(add("f2.parquet")))
    val t0 = 1600000000000L
    setCommitTime(dir, 0, t0)
    setCommitTime(dir, 1, t0 + 10000)
    setCommitTime(dir, 2, t0 + 20000)

    val log = DeltaLog.forPath(spark, dir.toString)
    assert(log.versionForTimestamp(t0) == 0)
    assert(log.versionForTimestamp(t0 + 9999) == 0)
    assert(log.versionForTimestamp(t0 + 10000) == 1)
    assert(log.versionForTimestamp(t0 + 999999) == 2)
    // before the first commit: clamps to the earliest version (delta.rs:1069-1071)
    assert(log.versionForTimestamp(t0 - 1) == 0)
    assert(log.snapshotForTimestamp(t0 + 15000).files.size == 2)
  }

  test("txn action replay is last-wins per appId (delta.rs:1437-1442)") {
    val dir = tempTable("txn")
    writeCommit(dir, 0, Seq(protocol, metaData,
      """{"txn":{"appId":"app-1","version":1}}"""))
    writeCommit(dir, 1, Seq("""{"txn":{"appId":"app-1","version":3}}""",
      """{"txn":{"appId":"app-2","version":7}}"""))
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.appTransactionVersion == Map("app-1" -> 3L, "app-2" -> 7L))
  }

  test("metaData replay fully replaces previous metadata (delta.rs:1434-1436)") {
    val dir = tempTable("md")
    writeCommit(dir, 0, Seq(protocol, metaData))
    val newSchema =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"v\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    writeCommit(dir, 1, Seq(
      s"""{"metaData":{"id":"99999999-2222-3333-4444-555555555555","format":{"provider":"parquet","options":{}},"schemaString":"$newSchema","partitionColumns":[],"configuration":{"x":"y"},"createdTime":1587968590000}}"""))
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.metadata.get.id.startsWith("99999999"))
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(snap.metadata.get.configuration == Map("x" -> "y"))
  }

  test("a gap in the log hides later commits (EndOfLog semantics, delta.rs:284-291)") {
    val dir = tempTable("gap")
    writeCommit(dir, 0, Seq(protocol, metaData, add("f0.parquet")))
    writeCommit(dir, 1, Seq(add("f1.parquet")))
    writeCommit(dir, 3, Seq(add("f3.parquet"))) // v2 missing
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.version == 1)
    assert(snap.files.map(_.path).toSet == Set("f0.parquet", "f1.parquet"))
  }

  test("re-add of same path replaces in place, no duplicates") {
    val dir = tempTable("readd")
    writeCommit(dir, 0, Seq(protocol, metaData, add("f0.parquet", size = 100)))
    writeCommit(dir, 1, Seq(add("f0.parquet", size = 999)))
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.files.size == 1)
    assert(snap.files.head.size == 999)
  }
}
