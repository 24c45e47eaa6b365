package graft.delta

import java.nio.file.{Files, Path => JPath}
import java.nio.file.attribute.FileTime
import java.time.OffsetDateTime
import java.util.Comparator

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Interop against the reference's checked-in golden Delta tables — fixtures
  * written by OTHER writers (Spark/Databricks Delta, delta 0.2.0-era), never
  * by this engine. This is the proof the log layer reads *foreign* tables:
  * field-order, checkpoint-struct and stats-string quirks included.
  *
  * Expectations are transcribed 1:1 from:
  *   - `rust/tests/read_delta_test.rs:10-228` (versioned file lists,
  *     tombstones, stats, partition filters, vacuum)
  *   - `rust/tests/read_simple_table_test.rs:9-187` (31-tombstone shape,
  *     version pinning, mtime time travel)
  *   - `rust/tests/datafusion_test.rs:12-120` (data-level query results)
  *
  * The fixture directories under `/root/reference/rust/tests/data` are
  * read-only; tests that need mutation (mtime pinning for time travel) copy
  * the table into a temp dir first.
  */
class InteropGoldenTableSpec extends AnyFunSuite with SparkTestBase {

  private val gold = "/root/reference/rust/tests/data"

  private def paths(t: DeltaTable): Seq[String] = t.files.map(_.path)

  // ------------------------------------------------------------ delta-0.2.0

  test("delta-0.2.0: latest version via foreign checkpoint (read_delta_test.rs:10-36)") {
    val t = DeltaTable.forPath(spark, s"$gold/delta-0.2.0")
    assert(t.version == 3)
    assert(t.snapshot.minWriterVersion == 2)
    assert(t.snapshot.minReaderVersion == 1)
    // _last_checkpoint points at v3; the checkpoint parquet was written by
    // delta 0.2.0 itself — restoring through it is the foreign-format path.
    assert(t.log.lastCheckpoint().map(_.version).contains(3L))
    assert(paths(t) == Seq(
      "part-00000-cb6b150b-30b8-4662-ad28-ff32ddab96d2-c000.snappy.parquet",
      "part-00000-7c2deba3-1994-4fb8-bc07-d46c948aa415-c000.snappy.parquet",
      "part-00001-c373a5bd-85f0-4758-815e-7eb62007a15c-c000.snappy.parquet"))
    val tomb = t.snapshot.tombstones
    assert(tomb.length == 4)
    assert(tomb.head.path ==
      "part-00000-512e1537-8aaa-4193-b8b4-bef3de0de409-c000.snappy.parquet")
    assert(tomb.head.deletionTimestamp == 1564524298213L)
    assert(!tomb.head.dataChange)
  }

  test("delta-0.2.0: pinned versions replay JSON-only (read_delta_test.rs:52-95)") {
    val v0 = DeltaTable.forPath(spark, s"$gold/delta-0.2.0", 0)
    assert(v0.version == 0)
    assert(v0.snapshot.minWriterVersion == 2 && v0.snapshot.minReaderVersion == 1)
    assert(paths(v0) == Seq(
      "part-00000-b44fcdb0-8b06-4f3a-8606-f8311a96f6dc-c000.snappy.parquet",
      "part-00001-185eca06-e017-4dea-ae49-fc48b973e37e-c000.snappy.parquet"))

    val v2 = DeltaTable.forPath(spark, s"$gold/delta-0.2.0", 2)
    assert(v2.version == 2)
    assert(paths(v2) == Seq(
      "part-00000-7c2deba3-1994-4fb8-bc07-d46c948aa415-c000.snappy.parquet",
      "part-00001-c373a5bd-85f0-4758-815e-7eb62007a15c-c000.snappy.parquet"))

    val v3 = DeltaTable.forPath(spark, s"$gold/delta-0.2.0", 3)
    assert(v3.version == 3)
    assert(paths(v3) == Seq(
      "part-00000-cb6b150b-30b8-4662-ad28-ff32ddab96d2-c000.snappy.parquet",
      "part-00000-7c2deba3-1994-4fb8-bc07-d46c948aa415-c000.snappy.parquet",
      "part-00001-c373a5bd-85f0-4758-815e-7eb62007a15c-c000.snappy.parquet"))
  }

  // ----------------------------------------------------------- simple_table

  test("simple_table: latest state — 5 files, 31 tombstones (read_simple_table_test.rs:9-60)") {
    val t = DeltaTable.forPath(spark, s"$gold/simple_table")
    assert(t.version == 4)
    assert(t.snapshot.minWriterVersion == 2 && t.snapshot.minReaderVersion == 1)
    assert(paths(t) == Seq(
      "part-00000-c1777d7d-89d9-4790-b38a-6ee7e24456b1-c000.snappy.parquet",
      "part-00001-7891c33d-cedc-47c3-88a6-abcfb049d3b4-c000.snappy.parquet",
      "part-00004-315835fe-fb44-4562-98f6-5e6cfa3ae45d-c000.snappy.parquet",
      "part-00007-3a0e4727-de0d-41b6-81ef-5223cf40f025-c000.snappy.parquet",
      "part-00000-2befed33-c358-4768-a43c-3eda0d2a499d-c000.snappy.parquet"))
    assert(t.fileUris().forall(u => u.contains("/simple_table/part-")))
    val tomb = t.snapshot.tombstones
    assert(tomb.length == 31)
    assert(tomb.head.path ==
      "part-00006-63ce9deb-bc0f-482d-b9a1-7e717b67f294-c000.snappy.parquet")
    assert(tomb.head.deletionTimestamp == 1587968596250L)
    assert(tomb.head.dataChange)
  }

  test("simple_table: pinned versions 0/2/3 (read_simple_table_test.rs:63-126)") {
    val v0 = DeltaTable.forPath(spark, s"$gold/simple_table", 0)
    assert(v0.version == 0)
    assert(paths(v0) == Seq(
      "part-00000-a72b1fb3-f2df-41fe-a8f0-e65b746382dd-c000.snappy.parquet",
      "part-00001-c506e79a-0bf8-4e2b-a42b-9731b2e490ae-c000.snappy.parquet",
      "part-00003-508ae4aa-801c-4c2c-a923-f6f89930a5c1-c000.snappy.parquet",
      "part-00004-80938522-09c0-420c-861f-5a649e3d9674-c000.snappy.parquet",
      "part-00006-63ce9deb-bc0f-482d-b9a1-7e717b67f294-c000.snappy.parquet",
      "part-00007-94f725e2-3963-4b00-9e83-e31021a93cf9-c000.snappy.parquet"))

    val v2 = DeltaTable.forPath(spark, s"$gold/simple_table", 2)
    assert(v2.version == 2)
    assert(paths(v2) == Seq(
      "part-00000-c1777d7d-89d9-4790-b38a-6ee7e24456b1-c000.snappy.parquet",
      "part-00001-7891c33d-cedc-47c3-88a6-abcfb049d3b4-c000.snappy.parquet",
      "part-00003-53f42606-6cda-4f13-8d07-599a21197296-c000.snappy.parquet",
      "part-00004-315835fe-fb44-4562-98f6-5e6cfa3ae45d-c000.snappy.parquet",
      "part-00006-46f2ff20-eb5d-4dda-8498-7bfb2940713b-c000.snappy.parquet",
      "part-00007-3a0e4727-de0d-41b6-81ef-5223cf40f025-c000.snappy.parquet"))

    val v3 = DeltaTable.forPath(spark, s"$gold/simple_table", 3)
    assert(v3.version == 3)
    assert(paths(v3) == Seq(
      "part-00000-c1777d7d-89d9-4790-b38a-6ee7e24456b1-c000.snappy.parquet",
      "part-00001-7891c33d-cedc-47c3-88a6-abcfb049d3b4-c000.snappy.parquet",
      "part-00004-315835fe-fb44-4562-98f6-5e6cfa3ae45d-c000.snappy.parquet",
      "part-00007-3a0e4727-de0d-41b6-81ef-5223cf40f025-c000.snappy.parquet",
      "part-00000-f17fcbf5-e0dc-40ba-adae-ce66d1fcaef6-c000.snappy.parquet",
      "part-00001-bb70d2ba-c196-4df2-9c85-f34969ad3aa9-c000.snappy.parquet"))
  }

  test("simple_table: data query id > 5 → [7, 9] (datafusion_test.rs:12-33)") {
    val t = DeltaTable.forPath(spark, s"$gold/simple_table")
    val got = t.toDF.filter("id > 5").select("id").orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 9L))
  }

  test("simple_table_with_checkpoint: v0 + update == latest via checkpoint (read_delta_test.rs:38-49)") {
    val path = s"$gold/simple_table_with_checkpoint"
    val newest = DeltaTable.forPath(spark, path)
    assert(newest.version == 10)
    // latest restores through the Spark-written checkpoint at v10
    assert(newest.log.lastCheckpoint().map(_.version).contains(10L))

    val toUpdate = DeltaTable.forPath(spark, path, 0)
    val updated = toUpdate.log.update()
    assert(updated.version == newest.version)
    assert(updated.files.map(_.path).toSet == newest.snapshot.files.map(_.path).toSet)
  }

  // ------------------------------------------------------------ delta-0.8.0

  test("delta-0.8.0: files, foreign stats strings, tombstone metadata (read_delta_test.rs:97-145)") {
    val t = DeltaTable.forPath(spark, s"$gold/delta-0.8.0")
    assert(t.version == 1)
    assert(t.snapshot.minWriterVersion == 2 && t.snapshot.minReaderVersion == 1)
    assert(paths(t) == Seq(
      "part-00000-c9b90f86-73e6-46c8-93ba-ff6bfaf892a1-c000.snappy.parquet",
      "part-00000-04ec9591-0b73-459e-8d18-ba5711d6cbe1-c000.snappy.parquet"))

    // per-file stats written by Spark Delta parse: num_records sums to 4,
    // null_count["value"] is [0, 0]
    val stats = t.files.map(_.stats.flatMap(ActionCodec.statsFromJson))
    assert(stats.forall(_.isDefined))
    assert(stats.flatMap(_.map(_.numRecords)).sum == 4L)
    assert(stats.flatMap(_.map(_.nullCount("value").asLong)) == Seq(0L, 0L))

    val tomb = t.snapshot.tombstones
    assert(tomb.length == 1)
    assert(tomb.head.path ==
      "part-00001-911a94a2-43f6-4acb-8620-5e68c2654989-c000.snappy.parquet")
    assert(tomb.head.deletionTimestamp == 1615043776198L)
    assert(tomb.head.dataChange)
    assert(tomb.head.extendedFileMetadata.contains(true))
    assert(tomb.head.partitionValues.contains(Map.empty[String, String]))
    assert(tomb.head.size.contains(445L))
  }

  test("delta-0.8.0: table statistics merge + stats-backed min/max (datafusion_test.rs:56-120)") {
    val t = DeltaTable.forPath(spark, s"$gold/delta-0.8.0")
    val st = t.statistics
    assert(st.numRecords.contains(4L))
    assert(st.sizeInBytes == 440L + 440L)
    assert(st.nullCounts("value") == 0L)
    assert(st.minValues("value").asInt == 0)
    assert(st.maxValues("value").asInt == 4)

    // and the data itself agrees with the stats
    val row = t.toDF.selectExpr("max(value) AS mx", "min(value) AS mn").collect().head
    assert(row.getInt(0) == 4 && row.getInt(1) == 0)
  }

  test("delta-0.8.0: vacuum retention floor + dry-run candidates (read_delta_test.rs:230-265)") {
    val t = DeltaTable.forPath(spark, s"$gold/delta-0.8.0")
    intercept[IllegalArgumentException] { t.vacuum(retentionHours = 1.0, dryRun = true) }
    // 169 h: the single expired tombstone is the candidate (dry run — the
    // fixture dir is read-only and must stay untouched)
    assert(t.vacuum(retentionHours = 169.0, dryRun = true) == Seq(
      "part-00001-911a94a2-43f6-4acb-8620-5e68c2654989-c000.snappy.parquet"))
    // retention reaching back to the epoch: nothing is expired
    val hoursSinceEpoch = System.currentTimeMillis() / 3600000L
    assert(t.vacuum(retentionHours = hoursSinceEpoch.toDouble, dryRun = true).isEmpty)
  }

  test("delta-0.8.0-date: date column reads (datafusion_test.rs:36-54)") {
    val t = DeltaTable.forPath(spark, s"$gold/delta-0.8.0-date")
    val got = t.toDF.filter("dayOfYear = 2").select("date").collect()
    assert(got.length == 1)
    assert(got.head.getDate(0).toLocalDate == java.time.LocalDate.of(2021, 1, 2))
  }

  test("delta-0.8-empty: zero active files, readable empty scan") {
    val t = DeltaTable.forPath(spark, s"$gold/delta-0.8-empty")
    assert(t.files.isEmpty)
    assert(t.toDF.count() == 0L)
  }

  // ----------------------------------------------- delta-0.8.0-partitioned

  test("delta-0.8.0-partitioned: =, !=, in, not in partition filters (read_delta_test.rs:148-228)") {
    val t = DeltaTable.forPath(spark, s"$gold/delta-0.8.0-partitioned")

    val eq = Seq(PartitionFilter.Eq("month", "2"), PartitionFilter.Eq("year", "2020"))
    assert(PartitionFilter.prune(t.files, eq).map(_.path) == Seq(
      "year=2020/month=2/day=3/part-00000-94d16827-f2fd-42cd-a060-f67ccc63ced9.c000.snappy.parquet",
      "year=2020/month=2/day=5/part-00000-89cdd4c8-2af7-4add-8ea3-3990b2f027b5.c000.snappy.parquet"))
    assert(t.fileUris(PartitionFilter.prune(t.files, eq)).forall(u =>
      u.contains("/delta-0.8.0-partitioned/year=2020/month=2/")))

    val ne = Seq(PartitionFilter.Ne("month", "2"))
    assert(PartitionFilter.prune(t.files, ne).map(_.path) == Seq(
      "year=2020/month=1/day=1/part-00000-8eafa330-3be9-4a39-ad78-fd13c2027c7e.c000.snappy.parquet",
      "year=2021/month=12/day=20/part-00000-9275fdf4-3961-4184-baa0-1c8a2bb98104.c000.snappy.parquet",
      "year=2021/month=12/day=4/part-00000-6dc763c0-3e8b-4d52-b19e-1f92af3fbb25.c000.snappy.parquet",
      "year=2021/month=4/day=5/part-00000-c5856301-3439-4032-a6fc-22b7bc92bebb.c000.snappy.parquet"))

    val in = Seq(PartitionFilter.In("month", Set("2", "12")))
    assert(PartitionFilter.prune(t.files, in).map(_.path) == Seq(
      "year=2020/month=2/day=3/part-00000-94d16827-f2fd-42cd-a060-f67ccc63ced9.c000.snappy.parquet",
      "year=2020/month=2/day=5/part-00000-89cdd4c8-2af7-4add-8ea3-3990b2f027b5.c000.snappy.parquet",
      "year=2021/month=12/day=20/part-00000-9275fdf4-3961-4184-baa0-1c8a2bb98104.c000.snappy.parquet",
      "year=2021/month=12/day=4/part-00000-6dc763c0-3e8b-4d52-b19e-1f92af3fbb25.c000.snappy.parquet"))

    val notIn = Seq(PartitionFilter.NotIn("month", Set("2", "12")))
    assert(PartitionFilter.prune(t.files, notIn).map(_.path) == Seq(
      "year=2020/month=1/day=1/part-00000-8eafa330-3be9-4a39-ad78-fd13c2027c7e.c000.snappy.parquet",
      "year=2021/month=4/day=5/part-00000-c5856301-3439-4032-a6fc-22b7bc92bebb.c000.snappy.parquet"))
  }

  test("delta-0.8.0-partitioned: partition-filtered scan reads correct rows") {
    val t = DeltaTable.forPath(spark, s"$gold/delta-0.8.0-partitioned")
    val filtered = t.toDF(Seq(PartitionFilter.Eq("month", "2"), PartitionFilter.Eq("year", "2020")))
    // two single-row files under year=2020/month=2
    assert(filtered.count() == 2L)
    assert(filtered.select("year", "month").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("2020", "2")))
  }

  // ------------------------------------------------------------ checkpoints

  test("checkpoints fixture: 12-commit replay, full history") {
    val t = DeltaTable.forPath(spark, s"$gold/checkpoints")
    assert(t.version == 11)
    // every commit carries exactly one add, none removed
    assert(t.files.length >= 11)
  }

  // ---------------------------------------------------------- COVID-19_NYT

  test("COVID-19_NYT: 1,111,930 rows through a single-commit foreign table (read_delta_test shape)") {
    val t = DeltaTable.forPath(spark, s"$gold/COVID-19_NYT")
    assert(t.version == 0)
    assert(t.files.length == 8)
    // foreign per-file stats agree with the full-scan row count
    assert(t.statistics.numRecords.contains(1111930L))
    assert(t.toDF.count() == 1111930L)
    // 2-column projection + filter over the foreign parquet
    assert(t.toDF.select("state", "cases").filter("cases > 0").limit(5).collect().length == 5)
  }

  // ----------------------------------------------------------------- golden

  test("golden/data-reader-array-primitives: nested array columns of every primitive (s3_test.rs:100-111 shape)") {
    val t = DeltaTable.forPath(spark, s"$gold/golden/data-reader-array-primitives")
    assert(t.version == 0)
    assert(t.snapshot.minWriterVersion == 2 && t.snapshot.minReaderVersion == 1)
    val df = t.toDF
    // ten array-typed columns, 10 rows over 2 files: arrays of int/long/
    // byte/short/bool/float/double/string/binary/decimal through the scan
    assert(df.count() == 10L)
    val row = df.selectExpr(
      "as_array_int[0] AS i", "as_array_long[0] AS l", "as_array_string[0] AS s",
      "as_array_boolean[0] AS b", "as_array_double[0] AS d")
      .orderBy("i").collect()
    assert(row.map(_.getInt(0)).toSeq == (0 until 10))
    assert(row.map(_.getLong(1)).toSeq == (0L until 10L))
    assert(row.map(_.getString(2)).toSeq == (0 until 10).map(_.toString))
    assert(row.head.getBoolean(3)) // row 0: [true]
    assert(row.map(_.getDouble(4)).toSeq == (0 until 10).map(_.toDouble))
    // aggregate over exploded arrays
    assert(df.selectExpr("explode(as_array_int) AS v")
      .agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) == 45L)
  }

  test("concurrent_workers seed table: readable v0 with empty file list") {
    val t = DeltaTable.forPath(spark, s"$gold/concurrent_workers")
    assert(t.version == 0)
    assert(t.files.isEmpty) // the fixture ships only the protocol/metaData commit
  }

  // ------------------------------------------------- write-side golden diff

  /** The reverse interop direction: graft WRITES, the foreign artifact is
    * the yardstick. `delta-inspect` cannot build here (no crate registry in
    * this sandbox — `cargo build --offline` fails resolving dependencies),
    * so this is the r7 verdict's prescribed fallback: checkpoint the golden
    * log ourselves and diff action-for-action against the checkpoint a
    * FOREIGN writer produced for the very same commits. */
  test("graft checkpoint of the golden log diffs clean against the foreign-written checkpoint") {
    val src = java.nio.file.Paths.get(s"$gold/simple_table_with_checkpoint/_delta_log")
    val dir = Files.createTempDirectory("graft-interop-ckpt-")
    val logDir = dir.resolve("_delta_log")
    Files.createDirectories(logDir)
    // commits only — graft must produce the checkpoint + _last_checkpoint
    (0 to 10).foreach { v =>
      val name = f"$v%020d.json"
      Files.copy(src.resolve(name), logDir.resolve(name))
    }
    val log = DeltaLog.forPath(spark, dir.toString)
    val cp = log.checkpoint()
    assert(cp.version == 10 && cp.parts.isEmpty)

    def actions(p: org.apache.hadoop.fs.Path): Seq[Action] =
      Checkpoints.read(spark, Seq(p))
    val ours = actions(log.checkpointFile(10))
    val theirs = actions(new org.apache.hadoop.fs.Path(
      src.resolve("00000000000000000010.checkpoint.parquet").toString))

    // identical action multiplicity: 11 adds + protocol + metaData
    assert(ours.size == 13 && theirs.size == 13)
    def adds(as: Seq[Action]) = as.collect { case a: AddAction =>
      (a.path, a.partitionValues, a.size, a.modificationTime, a.dataChange,
        a.stats, a.tags) }.toSet
    assert(adds(ours) == adds(theirs),
      "add actions diverge from the foreign checkpoint")
    val Seq(opr) = ours.collect { case p: ProtocolAction => p }
    val Seq(tpr) = theirs.collect { case p: ProtocolAction => p }
    assert(opr == tpr)
    val Seq(omd) = ours.collect { case m: MetaDataAction => m }
    val Seq(tmd) = theirs.collect { case m: MetaDataAction => m }
    assert(omd.id == tmd.id && omd.schemaString == tmd.schemaString &&
      omd.partitionColumns == tmd.partitionColumns &&
      omd.configuration == tmd.configuration &&
      omd.createdTime == tmd.createdTime && omd.format == tmd.format)

    // _last_checkpoint: same JSON content as the foreign pointer
    val oursLc = ActionCodec.mapper.readTree(
      Files.readString(logDir.resolve("_last_checkpoint")))
    val theirsLc = ActionCodec.mapper.readTree(
      Files.readString(src.resolve("_last_checkpoint")))
    assert(oursLc == theirsLc)

    // restore equivalence: a cold load through OUR checkpoint yields the
    // same state as the golden table restored through THEIRS
    val viaOurs = DeltaTable.forPath(spark, dir.toString)
    val viaTheirs = DeltaTable.forPath(spark, s"$gold/simple_table_with_checkpoint")
    assert(viaOurs.version == viaTheirs.version)
    assert(paths(viaOurs).toSet == paths(viaTheirs).toSet)
  }

  // -------------------------------------------------------- time travel/ds

  test("simple_table copy: mtime-based time travel (read_simple_table_test.rs:129-187)") {
    val src = java.nio.file.Paths.get(s"$gold/simple_table")
    val dir = Files.createTempDirectory("graft-interop-ds-")
    copyTree(src, dir.resolve("simple_table"))
    val table = dir.resolve("simple_table")

    def ts(ds: String): Long = OffsetDateTime.parse(ds).toInstant.toEpochMilli
    val mtimes = Seq(
      0L -> "2020-05-01T22:47:31-07:00",
      1L -> "2020-05-02T22:47:31-07:00",
      2L -> "2020-05-03T22:47:31-07:00",
      3L -> "2020-05-04T22:47:31-07:00",
      4L -> "2020-05-05T22:47:31-07:00")
    mtimes.foreach { case (v, ds) =>
      Files.setLastModifiedTime(
        table.resolve("_delta_log").resolve(f"$v%020d.json"),
        FileTime.fromMillis(ts(ds)))
    }

    def versionAt(ds: String): Long =
      DeltaTable.forPathAsOf(spark, table.toString, ts(ds)).version

    // before v0's mtime: the reference clamps to the earliest version
    assert(versionAt("2020-05-01T00:47:31-07:00") == 0)
    assert(versionAt("2020-05-01T22:47:31-07:00") == 0)
    assert(versionAt("2020-05-02T22:47:31-07:00") == 1)
    assert(versionAt("2020-05-02T23:47:31-07:00") == 1)
    assert(versionAt("2020-05-03T22:47:31-07:00") == 2)
    assert(versionAt("2020-05-04T22:47:31-07:00") == 3)
    assert(versionAt("2020-05-05T21:47:31-07:00") == 3)
    assert(versionAt("2020-05-05T22:47:31-07:00") == 4)
    assert(versionAt("2020-05-25T22:47:31-07:00") == 4)

    deleteTree(dir)
  }

  private def copyTree(src: JPath, dst: JPath): Unit = {
    Files.walk(src).forEach { p =>
      val rel = src.relativize(p)
      val target = dst.resolve(rel.toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else {
        Files.createDirectories(target.getParent)
        Files.copy(p, target)
      }
    }
  }

  private def deleteTree(dir: JPath): Unit =
    Files.walk(dir).sorted(Comparator.reverseOrder[JPath]()).forEach(p => Files.delete(p))
}
