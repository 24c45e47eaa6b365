package graft.delta

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the round-11 replay-core review findings: pinned-load
  * contiguity, exact int64 stats pruning, torn `_last_checkpoint`
  * tolerance, warm-handle catch-up across a cleaned gap, foreign
  * checkpoint-interval tolerance, checkpoint tombstone expiry + the
  * vacuum untracked-file rule, and v2 manifest version validation on the
  * distributed path. */
class ReplayCoreReviewSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures._
  import spark.implicits._

  test("pinned loads refuse a log gap instead of a silently wrong snapshot") {
    val dir = tempTable("gap-pinned")
    writeCommit(dir, 0, Seq(protocol, metaData, add("f0.parquet")))
    writeCommit(dir, 1, Seq(add("f1.parquet")))
    writeCommit(dir, 2, Seq(add("f2.parquet")))
    writeCommit(dir, 3, Seq(add("f3.parquet")))
    val log = DeltaLog.forPath(spark, dir.toString)
    log.checkpoint(log.snapshotForVersion(2))

    // clean commit 0 — a gap below any covering checkpoint
    Files.delete(dir.resolve("_delta_log").resolve(f"${0L}%020d.json"))
    val fresh = DeltaLog.forPath(spark, dir.toString)
    // v1 can no longer be reconstructed: no checkpoint ≤ 1, commit 0 gone
    val e = intercept[IllegalStateException](fresh.snapshotForVersion(1))
    assert(e.getMessage.contains("missing from the log"))
    // v3 still restores through the checkpoint and replays the tail
    val s3 = fresh.snapshotForVersion(3)
    assert(s3.files.map(_.path).toSet ==
      Set("f0.parquet", "f1.parquet", "f2.parquet", "f3.parquet"))
  }

  test("stats pruning is exact past 2^53 on both pruning paths") {
    val big = 9007199254740992L // 2^53: (big+1).toDouble == big.toDouble
    val stats =
      s"""{"numRecords":1,"minValues":{"c":${big + 1}},"maxValues":{"c":${big + 1}},"nullCount":{"c":0}}"""
    val adds = Seq(AddAction("f.parquet", 1L, Map.empty, 1L,
      dataChange = true, stats = Some(stats)))
    // driver path: the file's only row (big+1) DOES match c > big — keep
    assert(StatsPredicate.prune(adds, Seq(StatsPredicate.Gt("c", big))).size == 1)
    // and strict greater-than against the max itself still prunes
    assert(StatsPredicate.prune(adds, Seq(StatsPredicate.Gt("c", big + 1))).isEmpty)

    // executor path: same two answers through the distributed JSON fold
    val dir = tempTable("stats-exact")
    writeCommit(dir, 0, Seq(protocol, metaData,
      add("f.parquet").replace(""","dataChange":true""",
        s""","dataChange":true,"stats":"${stats.replace("\"", "\\\"")}"""")))
    val log = DeltaLog.forPath(spark, dir.toString)
    assert(DistributedReplay.prunedAddActions(log,
      statsPredicates = Seq(StatsPredicate.Gt("c", big))).size == 1)
    assert(DistributedReplay.prunedAddActions(log,
      statsPredicates = Seq(StatsPredicate.Gt("c", big + 1))).isEmpty)
  }

  test("a torn _last_checkpoint reads as absent, not as a bricked table") {
    val dir = tempTable("torn-pointer").toString
    GraftWriter.write((0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    log.checkpoint()
    // tear the pointer mid-write (non-atomic overwrite per the protocol)
    log.store.write(new Path(log.logPath, "_last_checkpoint"), """{"vers""")
    assert(log.lastCheckpoint().isEmpty)
    // a cold reader discovers the checkpoint and serves the table
    assert(DeltaLog.forPath(spark, dir).update().files.nonEmpty)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 40)
  }

  test("a warm handle catches up across a cleaned-commit gap via the checkpoint") {
    val dir = tempTable("warm-gap").toString
    GraftWriter.write(Seq((0L, "v0")).toDF("id", "v"), dir)
    val held = DeltaLog.forPath(spark, dir)
    assert(held.update().version == 0)

    // another writer appends through the auto-checkpoint (v10) and beyond
    (1 to 12).foreach(i =>
      GraftWriter.write(Seq((i.toLong, s"v$i")).toDF("id", "v"), dir, SaveMode.Append))
    val other = DeltaLog.forPath(spark, dir)
    assert(other.update().version == 12)
    // log cleanup removes every commit below the checkpoint
    val deleted = other.cleanUpExpiredLogs(10, retentionMillis = 0)
    assert(deleted.exists(_.endsWith(f"${1L}%020d.json")))

    // the held handle's contiguous tail now dead-ends at v0 — it must
    // bridge through the surviving checkpoint instead of staying stale
    val caught = held.update()
    assert(caught.version == 12, s"stuck at ${caught.version}")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 13)
  }

  test("foreign checkpointInterval garbage falls back to the default") {
    assert(TableConfig.checkpointInterval(Map("delta.checkpointInterval" -> "0")) == 10)
    assert(TableConfig.checkpointInterval(Map("delta.checkpointInterval" -> "-3")) == 10)
    assert(TableConfig.checkpointInterval(Map("delta.checkpointInterval" -> "soon")) == 10)
    assert(TableConfig.checkpointInterval(Map("delta.checkpointInterval" -> "4")) == 4)
  }

  test("checkpoints expire retention-aged tombstones; vacuum reclaims untracked files") {
    val dir = tempTable("tombstone-expiry").toString
    GraftWriter.write((0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(2), dir)
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.DeletedFileRetention -> "interval 0 hours"))
    Dml.delete(spark, dir, col("id") < 25)
    val log = DeltaLog.forPath(spark, dir)
    val snapBefore = log.update()
    assert(snapBefore.tombstones.nonEmpty)
    Thread.sleep(5) // tombstones age past the zero-retention cutoff
    val cp = log.checkpoint()
    // the checkpoint carries no expired tombstones...
    val ckptActs = Checkpoints.read(spark, log.checkpointPaths(cp))
    assert(!ckptActs.exists(_.isInstanceOf[RemoveAction]),
      "expired tombstones must not ride the checkpoint")
    // ...and a cold load from it still serves the right rows
    assert(DeltaLog.forPath(spark, dir).update().version == snapBefore.version)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 25)

    // the removed files are now UNTRACKED (no tombstone anywhere once the
    // checkpoint is the base) — vacuum's mtime rule reclaims them
    Thread.sleep(5)
    val reclaimed = DeltaTable.forPath(spark, dir).vacuum()
    assert(reclaimed.nonEmpty, "untracked removed files must be reclaimed")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 25)
  }

  test("readNonAddV2 validates the manifest's declared version (distributed path parity)") {
    val dir = tempTable("v2-version").toString
    GraftWriter.write((0 until 30).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir)
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.CheckpointPolicy -> "v2"))
    val log = DeltaLog.forPath(spark, dir)
    val cp = log.checkpoint()
    val name = cp.v2FileName.get
    // correct version: reads; wrong expected version: both paths refuse
    assert(Checkpoints.readNonAddV2(log, cp.version, name).nonEmpty)
    intercept[IllegalStateException](
      Checkpoints.readNonAddV2(log, cp.version + 1, name))
    intercept[IllegalStateException](
      Checkpoints.readV2(log, cp.version + 1, name))
  }
}
