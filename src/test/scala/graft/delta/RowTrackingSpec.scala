package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Row tracking (`rowTracking` writer feature): fresh files get id ranges
  * from the `delta.rowTracking` high-water mark (bumped in the same
  * commit), `defaultRowCommitVersion` stamps at the landing version, DV
  * DELETE preserves identities for free, and row-moving rewrites
  * (OPTIMIZE/Z-ORDER/CoW DML/DV UPDATE/MERGE) MATERIALIZE each surviving
  * row's identity into the rewritten files. */
class RowTrackingSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def enableRt(dir: String): Unit =
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.EnableRowTracking -> "true"))

  private def snap(dir: String): Snapshot = DeltaLog.forPath(spark, dir).update()

  /** business key `id` → (row_id, row_commit_version). */
  private def identityMap(dir: String): Map[Long, (Long, Long)] =
    DeltaTable.forPath(spark, dir).withRowIds
      .select(col("id"), col("_row_id"), col("_row_commit_version"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("enabling declares rowTracking + domainMetadata; appends allocate disjoint ranges") {
    val dir = tempTable("rt-alloc").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, "a")).toDF("id", "v"), dir)
    enableRt(dir)
    val s0 = snap(dir)
    assert(s0.writerFeatures.getOrElse(Set.empty).contains("rowTracking"))
    assert(s0.writerFeatures.getOrElse(Set.empty).contains("domainMetadata"))

    GraftWriter.write((0 until 7).map(i => (100L + i, "b")).toDF("id", "v")
      .repartition(2), dir, SaveMode.Append)
    GraftWriter.write(Seq((200L, "c")).toDF("id", "v"), dir, SaveMode.Append)
    val s = snap(dir)
    val tracked = s.files.filter(_.baseRowId.isDefined)
    assert(tracked.size == 3, "every post-enablement file carries a base id")
    // ranges [base, base+numRecords) are pairwise disjoint
    val ranges = tracked.map { a =>
      val n = a.stats.flatMap(ActionCodec.statsFromJson).get.numRecords
      (a.baseRowId.get, a.baseRowId.get + n)
    }.sorted
    ranges.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) => assert(e1 <= s2, s"overlap in $ranges")
      case _ => ()
    }
    // high-water mark covers the top allocation
    assert(RowTracking.highWaterMark(s) == ranges.map(_._2).max - 1)
    // defaultRowCommitVersion = the add's landing version
    tracked.foreach(a => assert(a.defaultRowCommitVersion.isDefined))
    val versions = tracked.flatMap(_.defaultRowCommitVersion).distinct.sorted
    assert(versions.size == 2) // the two appends
  }

  test("ids round-trip commits, checkpoints (classic + v2), and the distributed restore") {
    val dir = tempTable("rt-roundtrip").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    enableRt(dir)
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    val before = snap(dir).files.map(a => a.path ->
      (a.baseRowId, a.defaultRowCommitVersion)).toMap

    DeltaLog.forPath(spark, dir).checkpoint()
    val cold = snap(dir)
    assert(cold.files.map(a => a.path ->
      (a.baseRowId, a.defaultRowCommitVersion)).toMap == before)

    // distributed restore path preserves them too
    spark.conf.set(DeltaLog.DistributedThresholdKey, "1")
    try {
      val dist = DeltaLog.forPath(spark, dir).update()
      assert(dist.files.map(a => a.path ->
        (a.baseRowId, a.defaultRowCommitVersion)).toMap == before)
    } finally spark.conf.unset(DeltaLog.DistributedThresholdKey)

    // v2 checkpoint carries them as well
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.CheckpointPolicy -> "v2"))
    DeltaLog.forPath(spark, dir).checkpoint()
    val v2 = snap(dir)
    before.foreach { case (p, ids) =>
      assert(v2.files.find(_.path == p).map(a =>
        (a.baseRowId, a.defaultRowCommitVersion)).contains(ids))
    }
  }

  test("DV DELETE preserves identities (file bytes unchanged)") {
    val dir = tempTable("rt-dml").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, "x")).toDF("id", "v"), dir)
    enableRt(dir)
    GraftWriter.write((10 until 20).map(i => (i.toLong, "y")).toDF("id", "v"),
      dir, SaveMode.Append)
    val before = snap(dir).files.flatMap(a =>
      a.baseRowId.map(b => a.path -> b)).toMap

    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.EnableDeletionVectors -> "true"))
    Dml.delete(spark, dir, col("id") === 15L) // merge-on-read: ids preserved
    val after = snap(dir)
    before.foreach { case (p, b) =>
      assert(after.files.find(_.path == p).flatMap(_.baseRowId).contains(b))
    }
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 19)
  }

  test("OPTIMIZE and Z-ORDER materialize identities: every row keeps id AND version") {
    val dir = tempTable("rt-optimize").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, "x")).toDF("id", "v")
      .repartition(3), dir, configuration = Some(
        Map(TableConfig.EnableRowTracking -> "true")))
    GraftWriter.write((10 until 20).map(i => (i.toLong, "y")).toDF("id", "v")
      .repartition(2), dir, SaveMode.Append)
    val before = identityMap(dir)
    assert(before.size == 20 && before.values.map(_._1).toSet.size == 20,
      "fresh ids must be distinct before the rewrite")

    val m = Optimize.compact(spark, dir)
    assert(m.filesRemoved == 5)
    val s = snap(dir)
    // materialized column names recorded in the table configuration
    assert(RowTracking.materializedCols(s).isDefined)
    // every rewritten file still carries a fresh base range beyond the mark
    assert(s.files.forall(_.baseRowId.isDefined))
    assert(identityMap(dir) == before,
      "compaction changed a row identity or last-modified version")

    Optimize.zorder(spark, dir, Seq("v"))
    assert(identityMap(dir) == before,
      "z-order changed a row identity or last-modified version")

    // a SECOND rewrite must read the already-materialized values back
    Optimize.compact(spark, dir)
    assert(identityMap(dir) == before)
  }

  test("CoW UPDATE/DELETE keep ids; only touched rows advance their version") {
    val dir = tempTable("rt-cow").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, "x")).toDF("id", "v"), dir,
      configuration = Some(Map(TableConfig.EnableRowTracking -> "true")))
    val before = identityMap(dir)

    val mu = Dml.update(spark, dir, col("id") === 3L, Map("v" -> lit("z")))
    assert(mu.rowsAffected == 1)
    val afterU = identityMap(dir)
    assert(afterU.view.mapValues(_._1).toMap == before.view.mapValues(_._1).toMap,
      "CoW UPDATE must keep every row id")
    assert(afterU(3L)._2 == mu.version,
      s"updated row's version must be the update commit (${afterU(3L)._2} != ${mu.version})")
    (before.keySet - 3L).foreach { k =>
      assert(afterU(k)._2 == before(k)._2, s"untouched row $k advanced its version")
    }

    val md = Dml.delete(spark, dir, col("id") === 7L)
    val afterD = identityMap(dir)
    assert(!afterD.contains(7L))
    (afterU.keySet - 7L).foreach { k =>
      assert(afterD(k) == afterU(k), s"DELETE disturbed surviving row $k")
    }
    assert(md.rowsAffected == 1)
  }

  test("DV UPDATE moves transformed copies WITH their ids") {
    val dir = tempTable("rt-dvupd").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, "x")).toDF("id", "v"), dir,
      configuration = Some(Map(
        TableConfig.EnableRowTracking -> "true",
        TableConfig.EnableDeletionVectors -> "true")))
    val before = identityMap(dir)
    val m = Dml.update(spark, dir, col("id") === 4L, Map("v" -> lit("moved")))
    assert(m.rowsAffected == 1)
    val after = identityMap(dir)
    assert(after.view.mapValues(_._1).toMap == before.view.mapValues(_._1).toMap,
      "DV UPDATE must keep every row id")
    assert(after(4L)._2 == m.version)
    (before.keySet - 4L).foreach(k => assert(after(k)._2 == before(k)._2))
    assert(DeltaTable.forPath(spark, dir).toDF
      .filter(col("v") === "moved").count() == 1)
  }

  test("MERGE keeps target ids, advances updated versions, allocates fresh insert ids") {
    val dir = tempTable("rt-merge").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, "x")).toDF("id", "v"), dir,
      configuration = Some(Map(TableConfig.EnableRowTracking -> "true")))
    val before = identityMap(dir)
    val markBefore = RowTracking.highWaterMark(snap(dir))

    val m = Merge.into(spark, dir,
        Seq((1L, "upd"), (99L, "new")).toDF("id", "v"),
        col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("v" -> col("s.v")))
      .whenNotMatchedInsertAll()
      .execute()
    assert(m.rowsUpdated == 1 && m.rowsInserted == 1)
    val after = identityMap(dir)
    before.keySet.foreach { k =>
      assert(after(k)._1 == before(k)._1, s"merge changed row $k's id")
    }
    assert(after(1L)._2 == m.version, "updated row must carry the merge version")
    (before.keySet - 1L).foreach(k => assert(after(k)._2 == before(k)._2))
    assert(after(99L)._1 > markBefore, "inserted row needs a FRESH id beyond the old mark")
    assert(after(99L)._2 == m.version)
    assert(after.values.map(_._1).toSet.size == after.size, "row ids must stay unique")
  }

  test("FOREIGN-materialized row ids (hand-authored config + parquet columns) resolve and survive a graft rewrite") {
    // delta-spark shape: materialized column names recorded in the table
    // configuration, values written as hidden physical parquet columns
    val dirP = LogFixtures.tempTable("rt-foreign-mat")
    val dir = dirP.toString
    val matId = "_row-id-col-feedc0de"
    val matRcv = "_row-commit-version-col-feedc0de"
    def onePart(df: org.apache.spark.sql.DataFrame, dst: java.nio.file.Path): Long = {
      val tmp = java.nio.file.Files.createTempDirectory("rt-fx-")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), dst)
      java.nio.file.Files.size(dst)
    }
    // a foreign rewrite moved rows 0..2 into this file, materializing ids
    // 100,101,102 born at versions 1,1,2
    val s0 = onePart(
      Seq((0L, "a", 100L, 1L), (1L, "b", 101L, 1L), (2L, "c", 102L, 2L))
        .toDF("id", "v", matId, matRcv),
      dirP.resolve("part-00000-foreign.snappy.parquet"))
    val schemaStr =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"v\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    LogFixtures.writeCommit(dirP, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking","domainMetadata"]}}""",
      s"""{"metaData":{"id":"bbbbbbbb-0000-4000-8000-000000000001","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":[],"configuration":{"delta.rowTracking.materializedRowIdColumnName":"$matId","delta.rowTracking.materializedRowCommitVersionColumnName":"$matRcv"},"createdTime":1}}""",
      """{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\"rowIdHighWaterMark\":102}","removed":false}}""",
      s"""{"add":{"path":"part-00000-foreign.snappy.parquet","partitionValues":{},"size":$s0,"modificationTime":2,"dataChange":true,"baseRowId":0,"defaultRowCommitVersion":0,"stats":"{\\"numRecords\\":3,\\"minValues\\":{\\"id\\":0},\\"maxValues\\":{\\"id\\":2},\\"nullCount\\":{\\"id\\":0}}"}}"""))

    // graft resolves the FOREIGN materialized identities, not the fresh ones
    val before = identityMap(dir)
    assert(before == Map(0L -> (100L, 1L), 1L -> (101L, 1L), 2L -> (102L, 2L)))
    // a graft CoW UPDATE preserves them and uses the foreign names
    val m = Dml.update(spark, dir, col("id") === 1L, Map("v" -> lit("z")))
    val after = identityMap(dir)
    assert(after(1L) == ((101L, m.version)))
    assert(after(0L) == ((100L, 1L)) && after(2L) == ((102L, 2L)))
    // no second set of names was minted
    val s = DeltaLog.forPath(spark, dir).update()
    assert(RowTracking.materializedCols(s).contains((matId, matRcv)))
    // fresh allocation stayed beyond the foreign high-water mark
    assert(s.files.flatMap(_.baseRowId).forall(_ > 102L || s.files.size == 1))
  }

  test("a table BORN with delta.enableRowTracking allocates ids for its version-0 files") {
    // r9 review: the create path declared the feature but skipped the
    // allocation — version 0 is not exempt from the contract
    val dir = tempTable("rt-born").toString
    GraftWriter.write((0 until 6).map(i => (i.toLong, "a")).toDF("id", "v")
      .repartition(2), dir,
      configuration = Some(Map(TableConfig.EnableRowTracking -> "true")))
    val s = snap(dir)
    assert(s.writerFeatures.getOrElse(Set.empty).contains("rowTracking"))
    val v0 = s.files
    assert(v0.nonEmpty && v0.forall(_.baseRowId.isDefined),
      "version-0 files must carry base row ids")
    assert(v0.forall(_.defaultRowCommitVersion.contains(0L)))
    assert(RowTracking.highWaterMark(s) == 5L)
  }

  test("racing appends never collide id ranges (domain conflict aborts the loser)") {
    val dir = tempTable("rt-race").toString
    GraftWriter.write(Seq((0L, "a")).toDF("id", "v"), dir)
    enableRt(dir)
    // uncached: two INDEPENDENT writers (the r17 cache would hand both the
    // same handle and the second would never see a stale high-water mark)
    val log1 = DeltaLog.forPathUncached(spark, dir); log1.update()
    val log2 = DeltaLog.forPathUncached(spark, dir); log2.update()
    def appendVia(log: DeltaLog, p: String): Unit = {
      val snap = log.snapshot
      val add = AddAction(p, 10, Map.empty, 1L, dataChange = true,
        stats = Some("""{"numRecords":5,"minValues":{},"maxValues":{},"nullCount":{}}"""))
      val (stamped, bump) = RowTracking.assignFreshRowIds(snap, Seq(add))
      val txn = log.startTransaction()
      bump.foreach(txn.addAction)
      txn.addActions(stamped)
      txn.commit()
    }
    appendVia(log1, "f1.parquet")
    intercept[ConcurrentDomainMetadataException](appendVia(log2, "f2.parquet"))
    // loser retries from a FRESH snapshot and lands on the advanced mark
    log2.update()
    appendVia(log2, "f2.parquet")
    val s = snap(dir)
    val r = s.files.filter(_.baseRowId.isDefined).map { a =>
      val n = a.stats.flatMap(ActionCodec.statsFromJson).get.numRecords
      (a.baseRowId.get, a.baseRowId.get + n)
    }.sorted
    r.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) => assert(e1 <= s2, s"collision in $r")
      case _ => ()
    }
  }
}
