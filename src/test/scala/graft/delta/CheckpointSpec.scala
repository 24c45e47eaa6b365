package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

class CheckpointSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures._

  test("checkpoint write + reload round-trip (checkpoint_writer_test.rs:12-62)") {
    val dir = tempTable("cp-roundtrip").toString
    import spark.implicits._
    GraftWriter.write((0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir)
    (0 until 5).foreach { b =>
      GraftWriter.write(Seq(((100 + b).toLong, s"x$b")).toDF("id", "v"), dir, SaveMode.Append)
    }
    val log = DeltaLog.forPath(spark, dir)
    val before = log.update()
    val cp = log.checkpoint()
    assert(cp.version == 5)

    assert(log.lastCheckpoint().map(_.version).contains(5L))
    assert(log.store.exists(log.checkpointFile(5)))

    // a FRESH client restores through the checkpoint and sees identical state
    val log2 = DeltaLog.forPath(spark, dir)
    val snap2 = log2.update()
    assert(snap2.version == before.version)
    assert(snap2.files.map(_.path).toSet == before.files.map(_.path).toSet)
    assert(snap2.metadata.map(_.schemaString) == before.metadata.map(_.schemaString))
    assert(snap2.minReaderVersion == 1 && snap2.minWriterVersion == 2)
    // stats survive the checkpoint round-trip
    assert(snap2.statistics.numRecords == before.statistics.numRecords)
  }

  test("checkpoint + trailing commits replay on top") {
    val dir = tempTable("cp-trailing").toString
    import spark.implicits._
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    DeltaLog.forPath(spark, dir).checkpoint()
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.version == 1)
    assert(dt.toDF.count() == 2)
  }

  test("auto-checkpoint fires every 10th commit (delta-checkpoint main.rs:46)") {
    val dir = tempTable("cp-auto").toString
    import spark.implicits._
    (0 to 10).foreach { i =>
      GraftWriter.write(Seq((i.toLong, s"v$i")).toDF("id", "v"), dir,
        if (i == 0) SaveMode.ErrorIfExists else SaveMode.Append)
    }
    val log = DeltaLog.forPath(spark, dir)
    assert(log.lastCheckpoint().map(_.version).contains(10L))
    assert(log.update().files.size == 11)
  }

  test("time travel works through and past a checkpoint (findLatestCheckpointForVersion)") {
    val dir = tempTable("cp-tt").toString
    import spark.implicits._
    (0 until 12).foreach { i =>
      GraftWriter.write(Seq((i.toLong, s"v$i")).toDF("id", "v"), dir,
        if (i == 0) SaveMode.ErrorIfExists else SaveMode.Append)
    }
    val log = DeltaLog.forPath(spark, dir)
    assert(log.findLatestCheckpointForVersion(11).map(_.version).contains(10L))
    assert(log.findLatestCheckpointForVersion(9).isEmpty) // no checkpoint ≤ 9
    assert(log.snapshotForVersion(11).files.size == 12)
    assert(log.snapshotForVersion(10).files.size == 11)
    assert(log.snapshotForVersion(3).files.size == 4) // pure JSON replay
  }

  test("partitioned checkpoint carries partitionValues through parquet") {
    val dir = tempTable("cp-part").toString
    import spark.implicits._
    GraftWriter.write((0 until 30).map(i => (i.toLong, i % 3)).toDF("id", "p"),
      dir, SaveMode.ErrorIfExists, Seq("p"))
    val log = DeltaLog.forPath(spark, dir)
    log.checkpoint()
    val snap2 = DeltaLog.forPath(spark, dir).update()
    assert(snap2.files.forall(_.partitionValues.keySet == Set("p")))
    assert(snap2.files.map(_.partitionValues("p")).toSet == Set("0", "1", "2"))
    val dt = new DeltaTable(log, snap2)
    assert(dt.toDF(Seq(PartitionFilter.Eq("p", "2"))).count() == 10)
  }

  test("checkpoint carries typed stats_parsed and partitionValues_parsed (delta_arrow.rs:140-249)") {
    val dir = tempTable("cp-parsed").toString
    import spark.implicits._
    GraftWriter.write(
      (0 until 30).map(i => (i.toLong, s"n$i", i % 3)).toDF("id", "name", "p"),
      dir, SaveMode.ErrorIfExists, Seq("p"))
    val log = DeltaLog.forPath(spark, dir)
    log.checkpoint()
    val cp = spark.read.parquet(log.checkpointFile(0).toString)
    val adds = cp.filter(org.apache.spark.sql.functions.col("add").isNotNull)
      .select("add.path", "add.partitionValues_parsed.p",
        "add.stats_parsed.numRecords", "add.stats_parsed.minValues.id",
        "add.stats_parsed.maxValues.id", "add.stats_parsed.nullCount.id")
      .collect()
    assert(adds.nonEmpty)
    // partitionValues_parsed.p is typed INT (not the string "0"/"1"/"2")
    assert(adds.map(_.getInt(1)).toSet == Set(0, 1, 2))
    // stats_parsed carries real values matching the stats JSON
    assert(adds.map(_.getLong(2)).sum == 30L) // numRecords total
    assert(adds.map(_.getLong(3)).min == 0L)  // global min id
    assert(adds.map(_.getLong(4)).max == 29L) // global max id
    assert(adds.forall(_.getLong(5) == 0L))   // no nulls
  }

  test("date/timestamp/decimal partitions checkpoint TYPED partitionValues_parsed and reload cold") {
    val dir = tempTable("cp-typed-parts").toString
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (0 until 20).map { i =>
      (i.toLong, java.sql.Date.valueOf(s"2024-0${1 + i % 3}-15"),
        java.sql.Timestamp.valueOf(s"2024-01-0${1 + i % 2} 10:30:00"),
        new java.math.BigDecimal(s"${1 + i % 2}.50"))
    }.toDF("id", "d", "ts", "dec")
      .select(col("id"), col("d"), col("ts"),
        col("dec").cast("decimal(5,2)").as("dec"))
    GraftWriter.write(df, dir, SaveMode.ErrorIfExists, Seq("d", "ts", "dec"))
    val log = DeltaLog.forPath(spark, dir)
    log.checkpoint()
    val cp = spark.read.parquet(log.checkpointFile(0).toString)
    val pv = cp.schema("add").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .apply("partitionValues_parsed").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(pv("d").dataType == org.apache.spark.sql.types.DateType)
    assert(pv("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(pv("dec").dataType ==
      org.apache.spark.sql.types.DecimalType(5, 2))
    val typed = cp.filter(col("add").isNotNull)
      .select("add.partitionValues_parsed.d", "add.partitionValues_parsed.ts",
        "add.partitionValues_parsed.dec")
      .collect()
    assert(typed.nonEmpty)
    assert(typed.map(_.getDate(0).toString).toSet ==
      Set("2024-01-15", "2024-02-15", "2024-03-15"))
    assert(typed.map(_.getTimestamp(1)).forall(_ != null),
      "timestamp partition values must parse typed, not null")
    assert(typed.map(_.getDecimal(2).toPlainString).toSet == Set("1.50", "2.50"))
    // the table reloads cold THROUGH this checkpoint (string map intact)
    val cold = DeltaLog.forPath(spark, dir).update()
    assert(cold.files.forall(_.partitionValues.keySet == Set("d", "ts", "dec")))
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 20)
    assert(DeltaTable.forPath(spark, dir).toDF
      .filter(col("d") === "2024-01-15").count() > 0)
  }

  test("checkpoint parquet schema covers the reference's checkpoint schema field-for-field (delta_arrow.rs:140-249)") {
    // The inverse of the golden-table READ proofs: a delta-rs 0.4.1 client
    // restoring from a graft-written checkpoint resolves fields BY NAME
    // (action.rs:726-775 from_parquet_record), so every field the
    // reference's writer declares (delta_arrow.rs delta_log_schema_for_table)
    // must exist here under the same path with the matching type. Extra
    // fields are fine — the reference reader warns and skips unknown names —
    // and several of ours exist BECAUSE the reference reader handles them
    // (partitionValues/tags as parquet maps, action.rs:213-224;552-560 — the
    // reference writer just couldn't emit them yet, the Map TODOs).
    import org.apache.spark.sql.types._
    val dir = tempTable("cp-refschema").toString
    import spark.implicits._
    GraftWriter.write(
      (0 until 10).map(i => (i.toLong, s"n$i", i % 2)).toDF("id", "name", "p"),
      dir, SaveMode.ErrorIfExists, Seq("p"))
    val log = DeltaLog.forPath(spark, dir)
    log.checkpoint()
    val cp = spark.read.parquet(log.checkpointFile(0).toString).schema

    def at(path: String): DataType = path.split('.')
      .foldLeft(StructType(cp.fields): DataType) {
        case (StructType(fs), name) =>
          fs.find(_.name == name)
            .getOrElse(fail(s"checkpoint schema lacks reference field $path")).dataType
        case (other, name) => fail(s"$name under non-struct $other in $path")
      }

    // hardcoded from delta_arrow.rs:144-249 for table
    //   (id long, name string) partitioned by (p int)
    val expected: Seq[(String, DataType)] = Seq(
      "metaData.id" -> StringType,
      "metaData.name" -> StringType,
      "metaData.description" -> StringType,
      "metaData.schemaString" -> StringType,
      "metaData.createdTime" -> LongType,
      "metaData.partitionColumns" -> ArrayType(StringType),
      "metaData.format.provider" -> StringType,
      "protocol.minReaderVersion" -> IntegerType,
      "protocol.minWriterVersion" -> IntegerType,
      "txn.appId" -> StringType,
      "txn.version" -> LongType,
      "remove.path" -> StringType,
      "remove.deletionTimestamp" -> LongType,
      "remove.dataChange" -> BooleanType,
      "remove.extendedFileMetadata" -> BooleanType,
      "remove.size" -> LongType,
      "add.path" -> StringType,
      "add.size" -> LongType,
      "add.modificationTime" -> LongType,
      "add.dataChange" -> BooleanType,
      "add.stats" -> StringType,
      "add.stats_parsed.numRecords" -> LongType,
      "add.stats_parsed.minValues.id" -> LongType,
      "add.stats_parsed.minValues.name" -> StringType,
      "add.stats_parsed.maxValues.id" -> LongType,
      "add.stats_parsed.maxValues.name" -> StringType,
      "add.partitionValues_parsed.p" -> IntegerType)
    expected.foreach { case (path, dt) =>
      assert(at(path) == dt, s"$path: expected $dt, got ${at(path)}")
    }
    // exactly the reference's five action columns, all nullable structs
    assert(cp.fields.map(_.name).toSet == Set("txn", "add", "remove", "metaData", "protocol"))
    assert(cp.fields.forall(f => f.nullable && f.dataType.isInstanceOf[StructType]))
    // where we exceed the writer TODOs: the map shape the reference READER
    // expects (string->string parquet maps)
    val sMap = MapType(StringType, StringType, valueContainsNull = true)
    assert(at("add.partitionValues") == sMap)
    assert(at("add.tags") == sMap)
    assert(at("remove.partitionValues") == sMap)
    assert(at("metaData.configuration") == sMap)
    // divergence, on purpose: the reference types stats_parsed.nullCount
    // with the TABLE types (delta_arrow.rs:215-221) but its own protocol —
    // and its reader's StatsParsed (action.rs:85-90;323-339) — treat
    // nullCount as i64 counts; we write long
    assert(at("add.stats_parsed.nullCount.id") == LongType)
  }

  test("reference-written checkpointed table replays through our writer and back") {
    // Take the reference's own `checkpoints` fixture (12 commits, written by
    // checkpoint_writer_test.rs), restore it THROUGH ITS OWN parquet
    // checkpoint, re-write the state with OUR checkpoint writer on a fresh
    // copy, and prove a cold reader restores the identical file set.
    val gold = "/root/reference/rust/tests/data/checkpoints"
    val work = tempTable("cp-refreplay").toString
    val src = java.nio.file.Paths.get(gold)
    java.nio.file.Files.walk(src).forEach { p =>
      val rel = src.relativize(p).toString
      val dst = java.nio.file.Paths.get(work, rel)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val log = DeltaLog.forPath(spark, work)
    val before = log.update()
    assert(before.version == 11)

    log.checkpoint() // OUR writer, on top of the foreign-restored state
    // delete every JSON commit: the cold load below can ONLY come from the
    // graft-written checkpoint parquet
    java.nio.file.Files.list(java.nio.file.Paths.get(work, "_delta_log"))
      .filter(_.toString.endsWith(".json"))
      .forEach(p => java.nio.file.Files.delete(p))
    // forPathUncached: the claim is a COLD restore from the graft-written
    // checkpoint — the r17 shared-handle cache would serve the warm snapshot
    val after = DeltaLog.forPathUncached(spark, work).update()
    assert(after.version == before.version)
    assert(after.files.map(_.path).sorted == before.files.map(_.path).sorted)
    assert(after.metadata.map(_.schemaString) == before.metadata.map(_.schemaString))
    assert(after.minReaderVersion == before.minReaderVersion &&
      after.minWriterVersion == before.minWriterVersion)
  }

  test("multi-part checkpoint write + restore (delta.rs:412-436 naming)") {
    val dir = tempTable("cp-multipart").toString
    import spark.implicits._
    GraftWriter.write((0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4), dir)
    val log = DeltaLog.forPath(spark, dir)
    val before = log.update()
    assert(before.files.size >= 4)
    // force multipart: ≤3 actions per part
    val cp = log.checkpoint(before, maxActionsPerPart = 3)
    assert(cp.parts.exists(_ >= 2), s"expected multipart, got $cp")
    assert(log.lastCheckpoint().flatMap(_.parts) == cp.parts)
    assert(log.checkpointPaths(cp).forall(log.store.exists))
    assert(log.findLatestCheckpointForVersion(before.version)
      .flatMap(_.parts) == cp.parts)

    val snap2 = DeltaLog.forPath(spark, dir).update()
    assert(snap2.version == before.version)
    assert(snap2.files.map(_.path).toSet == before.files.map(_.path).toSet)
    assert(snap2.metadata.map(_.id) == before.metadata.map(_.id))
  }

  test("maxActionsPerPart conf multiparts the default checkpoint path") {
    val dir = tempTable("cp-conf-multipart").toString
    import spark.implicits._
    GraftWriter.write((0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4), dir)
    val log = DeltaLog.forPath(spark, dir)
    spark.conf.set(DeltaLog.MaxActionsPerPartKey, "3")
    try {
      val cp = log.checkpoint() // no caller opt-in: cadence path signature
      assert(cp.parts.exists(_ >= 2), s"expected conf-driven multipart, got $cp")
      val snap2 = DeltaLog.forPath(spark, dir).update()
      assert(snap2.files.map(_.path).toSet == log.snapshot.files.map(_.path).toSet)
    } finally spark.conf.unset(DeltaLog.MaxActionsPerPartKey)
  }

  test("incomplete multipart set is not selected by checkpoint discovery") {
    val dir = tempTable("cp-incomplete").toString
    import spark.implicits._
    GraftWriter.write((0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4), dir)
    val log = DeltaLog.forPath(spark, dir)
    val cp = log.checkpoint(log.update(), maxActionsPerPart = 3)
    // drop one part: the set is no longer complete
    log.store.delete(log.checkpointPaths(cp).head)
    assert(DeltaLog.forPath(spark, dir)
      .findLatestCheckpointForVersion(Long.MaxValue).isEmpty)
    // snapshotForVersion falls back to pure JSON replay and still works
    assert(DeltaLog.forPath(spark, dir).snapshotForVersion(0).files.nonEmpty)
    // and a cold update() survives the stale _last_checkpoint pointer
    val fresh = DeltaLog.forPath(spark, dir).update()
    assert(fresh.version == 0 && fresh.files.nonEmpty)
  }

  test("checkpoint of hand-written log with txns round-trips app versions") {
    val dir = tempTable("cp-txn")
    writeCommit(dir, 0, Seq(protocol, metaData, add("f0.parquet"),
      """{"txn":{"appId":"stream-1","version":41}}"""))
    val log = DeltaLog.forPath(spark, dir.toString)
    log.update()
    log.checkpoint()
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.appTransactionVersion == Map("stream-1" -> 41L))
  }

  test("checkpoint of a DV table drops superseded tombstones; restore keeps the file") {
    // DV DML remove+re-adds the same path in one commit, so the snapshot has
    // the path BOTH tombstoned and active. Checkpoint rows replay in
    // arbitrary order — if the tombstone survived into the checkpoint, a
    // restore could fold add(F) before remove(F) and silently lose F.
    val dir = tempTable("cp-dv-restore").toString
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftWriter.write((0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(2), dir)
    val log0 = DeltaLog.forPath(spark, dir)
    new DeltaTable(log0, log0.update())
      .setProperties(Map(TableConfig.EnableDeletionVectors -> "true"))
    Dml.delete(spark, dir, col("id") < 10)

    val log = DeltaLog.forPath(spark, dir)
    val before = log.update()
    val dvPaths = before.files.filter(DeletionVectors.hasDv).map(_.path)
    assert(dvPaths.nonEmpty, "precondition: DV commit re-added files")
    assert(before.tombstones.exists(t => dvPaths.contains(t.path)),
      "precondition: re-added path is also tombstoned in the snapshot")
    val cp = log.checkpoint()

    // written checkpoint carries NO tombstone for any active path
    val cpDf = spark.read.parquet(log.checkpointPaths(cp).map(_.toString): _*)
    val cpRemovePaths = cpDf.filter(col("remove").isNotNull)
      .select("remove.path").as[String].collect().toSet
    val cpAddPaths = cpDf.filter(col("add").isNotNull)
      .select("add.path").as[String].collect().toSet
    assert(cpRemovePaths.intersect(cpAddPaths).isEmpty)

    // a fresh client restoring through the checkpoint sees the DV'd file
    // active, with its tags, the reader fence, and the logical row count
    val snap2 = DeltaLog.forPath(spark, dir).update()
    assert(snap2.files.map(_.path).toSet == before.files.map(_.path).toSet)
    assert(snap2.files.filter(DeletionVectors.hasDv).map(_.path).toSet == dvPaths.toSet)
    assert(snap2.minReaderVersion == 3, "DV reader fence must survive checkpoint restore")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 90)
  }
}
