package graft.delta

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** V2 checkpoints (`v2Checkpoint` table feature): UUID-named manifests,
  * sidecar expansion, json + parquet forms, discovery, distributed
  * restore, retention cleanup, protocol fencing. */
class V2CheckpointSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def listLog(dir: String): Seq[String] = {
    val p = Paths.get(dir, "_delta_log")
    if (!Files.exists(p)) Nil
    else {
      val s = Files.list(p)
      try s.map[String](_.getFileName.toString).toArray.toSeq.map(_.toString).sorted
      finally s.close()
    }
  }

  private def v2Names(dir: String): Seq[String] =
    listLog(dir).filter(n => DeltaLog.V2CheckpointRe.findFirstIn(n).isDefined)

  private def sidecarNames(dir: String): Seq[String] = {
    val p = Paths.get(dir, "_delta_log", "_sidecars")
    if (!Files.exists(p)) Nil
    else {
      val s = Files.list(p)
      try s.map[String](_.getFileName.toString).toArray.toSeq.map(_.toString).sorted
      finally s.close()
    }
  }

  private def enableV2(dir: String): Unit =
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.CheckpointPolicy -> "v2"))

  test("flipping checkpointPolicy=v2 lifts the protocol on both sides") {
    val dir = tempTable("v2-protocol").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir)
    enableV2(dir)
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.minReaderVersion == 3 && snap.minWriterVersion == 7)
    assert(snap.readerFeatures.getOrElse(Set.empty).contains("v2Checkpoint"))
    assert(snap.writerFeatures.getOrElse(Set.empty).contains("v2Checkpoint"))
  }

  test("v2 checkpoint round-trips state through a cold load") {
    val dir = tempTable("v2-roundtrip").toString
    GraftWriter.write((0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4), dir)
    enableV2(dir)
    GraftWriter.write(Seq((100L, "x")).toDF("id", "v"), dir, SaveMode.Append)
    Dml.delete(spark, dir, org.apache.spark.sql.functions.col("id") < 10)
    DeltaTable.forPath(spark, dir).setDomainMetadata("app.d", "cfg")
    val log = DeltaLog.forPath(spark, dir)
    val before = log.update()
    val cp = log.checkpoint()
    assert(cp.v2FileName.isDefined, "checkpoint must be v2 under the policy")
    assert(v2Names(dir).size == 1)
    assert(sidecarNames(dir).nonEmpty, "file actions must land in sidecars")

    val cold = DeltaLog.forPath(spark, dir).update()
    assert(cold.version == before.version)
    assert(cold.files.map(_.path).sorted == before.files.map(_.path).sorted)
    assert(cold.files.flatMap(_.stats).size == before.files.flatMap(_.stats).size)
    assert(cold.tombstones.map(_.path).sorted == before.tombstones.map(_.path).sorted)
    assert(cold.domainMetadata == Map("app.d" -> "cfg"))
    assert(cold.metadata.map(_.schemaString) == before.metadata.map(_.schemaString))
    // and the data still reads
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 91)
  }

  test("multipart sidecars restore completely and time travel reads through v2") {
    val dir = tempTable("v2-multipart").toString
    GraftWriter.write((0 until 50).map(i => (i.toLong, "a")).toDF("id", "v")
      .repartition(8), dir)
    enableV2(dir)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    // tiny part bound → several sidecar files
    val cp = log.checkpoint(snap, maxActionsPerPart = 3)
    assert(sidecarNames(dir).size >= 3)
    val cold = DeltaLog.forPath(spark, dir).update()
    assert(cold.files.size == snap.files.size)
    // pinned-version load routes through the v2 checkpoint too
    GraftWriter.write(Seq((99L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    val pinned = DeltaLog.forPath(spark, dir).snapshotForVersion(cp.version)
    assert(pinned.files.size == snap.files.size)
  }

  test("auto-cadence writes v2 checkpoints under the policy") {
    val dir = tempTable("v2-cadence").toString
    GraftWriter.write(Seq((0L, "a")).toDF("id", "v"), dir)
    DeltaTable.forPath(spark, dir).setProperties(Map(
      TableConfig.CheckpointPolicy -> "v2",
      TableConfig.CheckpointInterval -> "4"))
    (0 until 6).foreach(i =>
      GraftWriter.write(Seq((i.toLong + 1, "x")).toDF("id", "v"), dir, SaveMode.Append))
    assert(v2Names(dir).nonEmpty)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 7)
  }

  test("foreign-shaped parquet manifest with INLINE file actions reads") {
    // spec-legal alternative layout: file actions inside the manifest, no
    // sidecars — built by hand the way a foreign engine would
    val dirP = tempTable("v2-foreign")
    val dir = dirP.toString
    GraftWriter.write((0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()

    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType), StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType), StructField("stats", StringType),
      StructField("tags", MapType(StringType, StringType))))
    val schema = StructType(Seq(
      StructField("checkpointMetadata", StructType(Seq(StructField("version", LongType)))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType))))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType),
          StructField("options", MapType(StringType, StringType))))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType))))),
      StructField("add", addT)))
    val md = snap.metadata.get
    val rows: Seq[Row] =
      Seq(Row(Row(snap.version), null, null, null),
        Row(null, Row(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint")), null, null),
        Row(null, null,
          Row(md.id, Row("parquet", Map.empty[String, String]), md.schemaString,
            Seq.empty[String], Map.empty[String, String]), null)) ++
      snap.files.map(a => Row(null, null, null,
        Row(a.path, a.partitionValues, a.size, a.modificationTime, false,
          a.stats.orNull, null)))
    val tmp = Files.createTempDirectory("v2-man-").toString
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .find(p => p.endsWith(".parquet")).get
    val manifestName =
      f"${snap.version}%020d.checkpoint.deadbeef-0000-4000-8000-000000000001.parquet"
    Files.copy(Paths.get(part),
      Paths.get(dir, "_delta_log", manifestName))
    // make the foreign checkpoint the ONLY path to state: pointer names it
    Files.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      s"""{"version":${snap.version},"size":${rows.size}}""")

    val cold = DeltaLog.forPathUncached(spark, dir).update()
    assert(cold.version == snap.version)
    assert(cold.files.map(_.path).sorted == snap.files.map(_.path).sorted)
    assert(cold.minReaderVersion == 3)
    assert(cold.readerFeatures.getOrElse(Set.empty).contains("v2Checkpoint"))
  }

  test("json-form v2 manifest with inline file actions reads") {
    val dir = tempTable("v2-json").toString
    GraftWriter.write((0 until 5).map(i => (i.toLong, "j")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val lines =
      Seq(s"""{"checkpointMetadata":{"version":${snap.version}}}""",
        ActionCodec.toJsonLine(ProtocolAction(3, 7,
          Some(Set("v2Checkpoint")), Some(Set("v2Checkpoint")))),
        ActionCodec.toJsonLine(snap.metadata.get)) ++
      snap.files.map(ActionCodec.toJsonLine)
    val name = f"${snap.version}%020d.checkpoint.cafebabe-0000-4000-8000-000000000002.json"
    Files.writeString(Paths.get(dir, "_delta_log", name), lines.mkString("\n"))

    val cold = DeltaLog.forPathUncached(spark, dir).update()
    assert(cold.files.map(_.path).sorted == snap.files.map(_.path).sorted)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 5)
  }

  test("a manifest declaring the wrong version is refused loudly") {
    val dir = tempTable("v2-vermismatch").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val lines = Seq(
      """{"checkpointMetadata":{"version":99}}""",
      ActionCodec.toJsonLine(ProtocolAction(1, 2)),
      ActionCodec.toJsonLine(snap.metadata.get)) ++ snap.files.map(ActionCodec.toJsonLine)
    val name = f"${snap.version}%020d.checkpoint.0badc0de-0000-4000-8000-000000000003.json"
    Files.writeString(Paths.get(dir, "_delta_log", name), lines.mkString("\n"))
    val e = intercept[IllegalStateException](
      DeltaLog.forPathUncached(spark, dir).update())
    assert(e.getMessage.contains("declares version 99"))
  }

  test("distributed restore serves v2 sidecar inventories without driver reads") {
    val dir = tempTable("v2-distributed").toString
    GraftWriter.write((0 until 40).map(i => (i.toLong, "d")).toDF("id", "v")
      .repartition(5), dir)
    enableV2(dir)
    DeltaLog.forPath(spark, dir).checkpoint()
    val before = Checkpoints.driverReads.get()
    spark.conf.set(DeltaLog.DistributedThresholdKey, "1")
    try {
      val cold = DeltaLog.forPathUncached(spark, dir).update()
      assert(cold.files.size == 5)
      // manifest reads are driver-side (tiny); the ADD inventory must not
      // be: exactly the sidecar-ref probes hit Checkpoints.read, never a
      // full readV2 of the checkpoint
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 40)
    } finally spark.conf.unset(DeltaLog.DistributedThresholdKey)
    assert(Checkpoints.driverReads.get() > before) // manifest probe happened
  }

  test("retention cleanup deletes superseded v2 manifests and orphaned sidecars") {
    val dir = tempTable("v2-cleanup").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, "c")).toDF("id", "v"), dir)
    enableV2(dir)
    val log = DeltaLog.forPath(spark, dir)
    log.checkpoint()
    val firstManifest = v2Names(dir)
    val firstSidecars = sidecarNames(dir)
    assert(firstManifest.size == 1 && firstSidecars.nonEmpty)

    GraftWriter.write(Seq((999L, "z")).toDF("id", "v"), dir, SaveMode.Append)
    val log2 = DeltaLog.forPath(spark, dir)
    log2.update()
    log2.checkpoint()
    // age everything below the new checkpoint past the cutoff
    val deleted = log2.cleanUpExpiredLogs(log2.snapshot.version, retentionMillis = -1000)
    assert(deleted.contains(firstManifest.head))
    firstSidecars.foreach(s => assert(deleted.contains(s"_sidecars/$s")))
    // the new checkpoint's sidecars survive (still referenced)
    assert(sidecarNames(dir).nonEmpty)
    // and the table still cold-loads + reads
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 11)
  }

  test("a table BORN with checkpointPolicy=v2 + ICT fences at creation and survives its first cadence checkpoint") {
    val dir = tempTable("v2-born").toString
    GraftWriter.write(Seq((0L, "a")).toDF("id", "v"), dir,
      configuration = Some(Map(
        TableConfig.CheckpointPolicy -> "v2",
        TableConfig.EnableInCommitTimestamps -> "true",
        TableConfig.CheckpointInterval -> "2")))
    val snap0 = DeltaLog.forPath(spark, dir).update()
    assert(snap0.minReaderVersion == 3 && snap0.minWriterVersion == 7)
    assert(snap0.readerFeatures.getOrElse(Set.empty).contains("v2Checkpoint"))
    assert(snap0.writerFeatures.getOrElse(Set.empty).contains("inCommitTimestamp"))
    // the creation commit itself runs on the ICT clock
    assert(DeltaLog.forPath(spark, dir).inCommitTimestampOf(0).isDefined)
    (1 to 3).foreach(i => GraftWriter.write(
      Seq((i.toLong, "x")).toDF("id", "v"), dir, SaveMode.Append))
    assert(v2Names(dir).nonEmpty, "cadence checkpoint must land as v2")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 4)
  }

  test("SQL CREATE TBLPROPERTIES v2+ICT fences at birth through the catalog") {
    val dir = tempTable("v2-sql-born").toString
    spark.sql(s"CREATE TABLE v2_sql_born (id BIGINT, v STRING) " +
      s"USING `graft-delta` OPTIONS (path '$dir') TBLPROPERTIES (" +
      "'delta.checkpointPolicy'='v2','delta.enableInCommitTimestamps'='true')")
    try {
      spark.sql("INSERT INTO v2_sql_born VALUES (1, 'a')")
      val snap = DeltaLog.forPath(spark, dir).update()
      assert(snap.readerFeatures.getOrElse(Set.empty).contains("v2Checkpoint"))
      assert(snap.writerFeatures.getOrElse(Set.empty).contains("inCommitTimestamp"))
      DeltaLog.forPath(spark, dir).checkpoint()
      assert(v2Names(dir).nonEmpty)
      assert(DeltaLog.forPath(spark, dir).inCommitTimestampOf(snap.version).isDefined)
    } finally spark.sql("DROP TABLE v2_sql_born")
  }

  test("writeV2 refuses without the v2Checkpoint feature") {
    val dir = tempTable("v2-nofeature").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val e = intercept[UnsupportedProtocolException](Checkpoints.writeV2(log, snap))
    assert(e.getMessage.contains("v2Checkpoint"))
  }
}
