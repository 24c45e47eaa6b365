package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** Distributed replay must agree exactly with driver-side replay on the same
  * log — including overwrite tombstones and checkpoint+tail logs. */
class DistributedReplaySpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def fileSet(s: Seq[AddAction]) = s.map(a => (a.path, a.size)).toSet

  test("matches driver replay across appends and an overwrite") {
    val dir = tempTable("dr-basic").toString
    GraftWriter.write((0 until 20).map(i => (i.toLong, s"a$i")).toDF("id", "v"), dir)
    GraftWriter.write((20 until 40).map(i => (i.toLong, s"b$i")).toDF("id", "v"),
      dir, SaveMode.Append)
    GraftWriter.write((0 until 5).map(i => (i.toLong, s"c$i")).toDF("id", "v"),
      dir, SaveMode.Overwrite) // removes all previous files
    val log = DeltaLog.forPath(spark, dir)
    val driver = log.update().files
    val dist = DistributedReplay.prunedAddActions(log)
    assert(fileSet(dist) == fileSet(driver))
    assert(dist.forall(_.stats.isDefined))
  }

  test("matches driver replay through a checkpoint plus trailing commits") {
    val dir = tempTable("dr-cp").toString
    (0 until 12).foreach { i => // auto-checkpoint at v10
      GraftWriter.write(Seq((i.toLong, s"v$i")).toDF("id", "v"), dir,
        if (i == 0) SaveMode.ErrorIfExists else SaveMode.Append)
    }
    val log = DeltaLog.forPath(spark, dir)
    assert(log.lastCheckpoint().isDefined)
    val driver = log.update().files
    val dist = DistributedReplay.prunedAddActions(log)
    assert(fileSet(dist) == fileSet(driver))
  }

  test("distributed pruning equals driver-side pruning") {
    val dir = tempTable("dr-prune").toString
    GraftWriter.write((0 until 60).map(i => (i.toLong, i % 3)).toDF("id", "p")
      .repartition(1), dir, SaveMode.ErrorIfExists, Seq("p"))
    GraftWriter.write((1000 until 1060).map(i => (i.toLong, i % 3)).toDF("id", "p")
      .repartition(1), dir, SaveMode.Append)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()

    val pf = Seq(PartitionFilter.In("p", Set("1", "2")))
    val sp = Seq[StatsPredicate](StatsPredicate.Ge("id", 1000L))
    val driver = StatsPredicate.prune(PartitionFilter.prune(snap.files, pf), sp)
    val dist = DistributedReplay.prunedAddActions(log, pf, sp)
    assert(fileSet(dist) == fileSet(driver))
    assert(dist.nonEmpty && dist.size < snap.files.size)
  }

  test("version-pinned distributed replay matches driver time travel") {
    val dir = tempTable("dr-tt").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    GraftWriter.write(Seq((1L, "z")).toDF("id", "v"), dir, SaveMode.Overwrite)
    val log = DeltaLog.forPath(spark, dir)
    (0L to 2L).foreach { v =>
      val driver = log.snapshotForVersion(v).files
      val dist = DistributedReplay.prunedAddActions(log, version = Some(v))
      assert(fileSet(dist) == fileSet(driver), s"version $v")
    }
  }

  test("empty log yields an empty file set") {
    val dir = tempTable("dr-empty")
    LogFixtures.writeCommit(dir, 0, Seq(LogFixtures.protocol, LogFixtures.metaData))
    val log = DeltaLog.forPath(spark, dir.toString)
    assert(DistributedReplay.prunedAddActions(log).isEmpty)
  }
}
