package graft.delta

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** In-commit timestamps (`inCommitTimestamp` writer feature): monotonic
  * commitInfo clock, enablement provenance, ICT-governed time travel and
  * history — mtimes stop being load-bearing once enabled. */
class InCommitTimestampSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def enableIct(dir: String): Long =
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.EnableInCommitTimestamps -> "true"))

  private def ictOf(dir: String, v: Long): Option[Long] =
    DeltaLog.forPath(spark, dir).inCommitTimestampOf(v)

  test("enablement commit stamps feature, provenance, and its own ICT") {
    val dir = tempTable("ict-enable").toString
    GraftWriter.write((0 until 5).map(i => (i.toLong, "a")).toDF("id", "v"), dir)
    val v = enableIct(dir)
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.minWriterVersion == 7)
    assert(snap.writerFeatures.getOrElse(Set.empty).contains("inCommitTimestamp"))
    val cfg = TableConfig.of(snap)
    assert(cfg.get(TableConfig.IctEnablementVersion).contains(v.toString))
    val ict = ictOf(dir, v)
    assert(ict.isDefined)
    assert(cfg.get(TableConfig.IctEnablementTimestamp).contains(ict.get.toString))
    // pre-enablement commit has no ICT
    assert(ictOf(dir, 0).isEmpty)
  }

  test("every commit shape carries a LEADING commitInfo with strictly increasing ICT") {
    val dir = tempTable("ict-monotonic").toString
    GraftWriter.write((0 until 20).map(i => (i.toLong, "a")).toDF("id", "v"), dir)
    enableIct(dir)
    GraftWriter.write(Seq((100L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    Dml.delete(spark, dir, col("id") < 3)
    DeltaTable.forPath(spark, dir).setDomainMetadata("d", "c")
    DeltaTable.forPath(spark, dir).setProperties(Map("user.key" -> "v"))
    val log = DeltaLog.forPath(spark, dir)
    val versions = log.listCommitVersions().filter(_ >= 1) // 1 = enablement
    val icts = versions.map(v => log.inCommitTimestampOf(v).getOrElse(
      fail(s"version $v lacks inCommitTimestamp")))
    assert(icts == icts.sorted && icts.distinct == icts,
      s"ICTs must strictly increase, got $icts")
    // commitInfo leads each ICT commit file
    versions.foreach { v =>
      val firstLine = Files.readString(
        Paths.get(dir, "_delta_log", f"$v%020d.json")).linesIterator.next()
      assert(firstLine.startsWith("{\"commitInfo\""),
        s"version $v must lead with commitInfo")
    }
  }

  test("a retried commit re-stamps its clock past the winner's") {
    val dir = tempTable("ict-retry").toString
    GraftWriter.write(Seq((0L, "x")).toDF("id", "v"), dir)
    enableIct(dir)
    val log1 = DeltaLog.forPath(spark, dir); log1.update()
    val log2 = DeltaLog.forPath(spark, dir); log2.update()
    val a1 = AddAction("f1.parquet", 10, Map.empty, 1L, dataChange = true)
    val a2 = AddAction("f2.parquet", 10, Map.empty, 1L, dataChange = true)
    val v1 = log1.startTransaction().addAction(a1).commit()
    val v2 = log2.startTransaction().addAction(a2).commit() // retries past v1
    assert(v2 == v1 + 1)
    val ict1 = ictOf(dir, v1).get
    val ict2 = ictOf(dir, v2).get
    assert(ict2 > ict1)
  }

  test("time travel and history read the ICT clock, not mtimes") {
    val dirP = tempTable("ict-timetravel")
    val dir = dirP.toString
    GraftWriter.write(Seq((0L, "v0")).toDF("id", "v"), dir)
    enableIct(dir)                                                    // v1
    GraftWriter.write(Seq((1L, "v2")).toDF("id", "v"), dir, SaveMode.Append) // v2
    GraftWriter.write(Seq((2L, "v3")).toDF("id", "v"), dir, SaveMode.Append) // v3
    val log = DeltaLog.forPath(spark, dir)
    log.update()
    val ict2 = log.inCommitTimestampOf(2).get
    // sabotage the mtimes: if anything still reads them, resolution breaks
    Seq(1L, 2L, 3L).foreach(v => LogFixtures.setCommitTime(dirP, v, 1000L))
    // uncached: the scenario is a fresh reader AFTER a log copy rewrote
    // mtimes — a warm handle's mtime cache would serve the old clocks
    val fresh = DeltaLog.forPathUncached(spark, dir)
    fresh.update()
    assert(fresh.versionForTimestamp(ict2) == 2)
    assert(fresh.versionTimestamp(2) == ict2)
    val t = DeltaTable.forPathAsOf(spark, dir, ict2)
    assert(t.toDF.count() == 2)
    // graft_history reports the ICT clock on both build paths
    def historyTs(): Map[Long, Long] =
      spark.sql(s"SELECT version, timestamp_ms FROM graft_history('$dir')")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(historyTs()(2) == ict2)
    spark.conf.set(GraftHistoryFunction.ThresholdKey, "1")
    try assert(historyTs()(2) == ict2)
    finally spark.conf.unset(GraftHistoryFunction.ThresholdKey)
  }

  test("a log copy that rewrites pre-ICT mtimes to NOW cannot break timestamp travel") {
    // r9 review: the binary search assumed one monotonic timestamp axis,
    // but a migration rewrites every mtime — putting the mtime segment
    // AFTER the ICT segment. Each segment now searches on its own axis.
    val dirP = tempTable("ict-logcopy")
    val dir = dirP.toString
    GraftWriter.write(Seq((0L, "a")).toDF("id", "v"), dir)              // v0 (mtime era)
    GraftWriter.write(Seq((1L, "b")).toDF("id", "v"), dir, SaveMode.Append) // v1
    enableIct(dir)                                                      // v2
    GraftWriter.write(Seq((2L, "c")).toDF("id", "v"), dir, SaveMode.Append) // v3
    val log = DeltaLog.forPath(spark, dir)
    log.update()
    val ict2 = log.inCommitTimestampOf(2).get
    val ict3 = log.inCommitTimestampOf(3).get
    // "copy the table": every pre-ICT mtime becomes far in the future
    Seq(0L, 1L).foreach(v =>
      LogFixtures.setCommitTime(dirP, v, System.currentTimeMillis() + 3600_000L))
    val fresh = DeltaLog.forPath(spark, dir)
    fresh.update()
    assert(fresh.versionForTimestamp(ict2) == 2)
    assert(fresh.versionForTimestamp(ict3) == 3)
    assert(fresh.versionForTimestamp(Long.MaxValue) == 3)
  }

  test("pre-enablement versions keep resolving by mtime") {
    val dirP = tempTable("ict-handover")
    val dir = dirP.toString
    GraftWriter.write(Seq((0L, "a")).toDF("id", "v"), dir)             // v0
    GraftWriter.write(Seq((1L, "b")).toDF("id", "v"), dir, SaveMode.Append) // v1
    LogFixtures.setCommitTime(dirP, 0, 5000L)
    LogFixtures.setCommitTime(dirP, 1, 6000L)
    enableIct(dir)                                                     // v2
    // uncached: setCommitTime rewrote v0/v1 mtimes behind the writer's
    // warm handle, whose mtime cache would otherwise serve the old values
    val log = DeltaLog.forPathUncached(spark, dir)
    log.update()
    assert(log.versionTimestamp(0) == 5000L)
    assert(log.versionTimestamp(1) == 6000L)
    assert(log.versionForTimestamp(5500L) == 0)
    assert(log.versionTimestamp(2) == log.inCommitTimestampOf(2).get)
  }
}
