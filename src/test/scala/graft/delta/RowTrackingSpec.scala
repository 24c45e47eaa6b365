package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Row tracking (`rowTracking` writer feature), the maintained subset:
  * fresh files get id ranges from the `delta.rowTracking` high-water mark
  * (bumped in the same commit), `defaultRowCommitVersion` stamps at the
  * landing version, DV DELETE preserves identities, rewriting ops refuse
  * loudly. */
class RowTrackingSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def enableRt(dir: String): Unit =
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.EnableRowTracking -> "true"))

  private def snap(dir: String): Snapshot = DeltaLog.forPath(spark, dir).update()

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

  test("DV DELETE preserves identities; rewriting ops refuse loudly") {
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

    // CoW rewrite refuses
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.EnableDeletionVectors -> "false"))
    val e1 = intercept[UnsupportedProtocolException](
      Dml.update(spark, dir, col("id") === 1L, Map("v" -> lit("z"))))
    assert(e1.getMessage.contains("rowTracking"))
    intercept[UnsupportedProtocolException](Optimize.compact(spark, dir))
    intercept[UnsupportedProtocolException](
      Merge.into(spark, dir, Seq((1L, "m")).toDF("id", "v"),
        col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("v" -> col("s.v"))).execute())
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
    val log1 = DeltaLog.forPath(spark, dir); log1.update()
    val log2 = DeltaLog.forPath(spark, dir); log2.update()
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
