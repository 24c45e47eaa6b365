package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DeletionVectorsSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.{remove, tempTable, writeCommit}
  import spark.implicits._

  private def dvTable(name: String, rows: Int = 100): String = {
    val dir = tempTable(name).toString
    GraftWriter.write((0 until rows).map(i => (i.toLong, s"n$i")).toDF("id", "v")
      .repartition(2), dir)
    new DeltaTable(DeltaLog.forPath(spark, dir), DeltaLog.forPath(spark, dir).update())
      .setProperties(Map(TableConfig.EnableDeletionVectors -> "true"))
    dir
  }

  test("DV DELETE removes rows without rewriting any data file") {
    val dir = dvTable("dv-delete")
    val before = DeltaTable.forPath(spark, dir)
    val dataPaths = before.files.map(_.path).toSet

    val m = Dml.delete(spark, dir, col("id") < 10)
    assert(m.rowsAffected == 10)

    val dt = DeltaTable.forPath(spark, dir)
    // same physical files, now carrying DV pointers
    assert(dt.files.map(_.path).toSet == dataPaths)
    assert(dt.files.forall(a => DeletionVectors.hasDv(a) ||
      DeletionVectors.cardinality(a) == 0))
    assert(dt.files.map(DeletionVectors.cardinality).sum == 10)
    // logical view subtracts the deleted positions
    assert(dt.toDF.count() == 90)
    assert(dt.toDF.filter(col("id") < 10).count() == 0)
    assert(dt.toDF.agg(sum("id")).as[Long].head() == (10L until 100L).sum)
    // pre-delete version still shows everything
    assert(DeltaTable.forPath(spark, dir, m.version - 1).toDF.count() == 100)
  }

  test("second DV DELETE on the same file unions positions") {
    val dir = dvTable("dv-delete-twice")
    Dml.delete(spark, dir, col("id") < 10)
    val m2 = Dml.delete(spark, dir, col("id") >= 10 && col("id") < 15)
    assert(m2.rowsAffected == 5)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.count() == 85)
    assert(dt.files.map(DeletionVectors.cardinality).sum == 15)
    // deleting already-deleted rows is a no-op, not a double count
    val m3 = Dml.delete(spark, dir, col("id") < 15)
    assert(m3.rowsAffected == 0)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 85)
  }

  test("DV UPDATE moves matched rows to new files, old files unrewritten") {
    val dir = dvTable("dv-update")
    val before = DeltaTable.forPath(spark, dir).files.map(_.path).toSet
    val m = Dml.update(spark, dir, col("id") < 5, Map("v" -> lit("updated")))
    assert(m.rowsAffected == 5)
    val dt = DeltaTable.forPath(spark, dir)
    assert(before.subsetOf(dt.files.map(_.path).toSet)) // originals still there
    assert(dt.files.size > before.size)                 // plus appended updates
    assert(dt.toDF.count() == 100)
    assert(dt.toDF.filter(col("v") === "updated").count() == 5)
    assert(dt.toDF.filter(col("id") < 5 && col("v") =!= "updated").count() == 0)
  }

  test("SQL reads through the catalog subtract DVs") {
    val dir = dvTable("dv-sql")
    Dml.delete(spark, dir, col("id") >= 90)
    val viaFormat = spark.read.format("graft-delta").load(dir)
    assert(viaFormat.count() == 90)
    assert(viaFormat.filter(col("id") >= 90).count() == 0)
    // filters must still reach the scan below the anti-join
    val planStr = viaFormat.filter(col("id") < 5).queryExecution
      .executedPlan.toString
    assert(planStr.contains("LessThan(id,5)") && planStr.contains("PushedFilters"),
      s"expected pushed filter under the DV anti-join:\n$planStr")
  }

  test("aggregate answers stay exact (stats fast path fenced)") {
    val dir = dvTable("dv-stats")
    Dml.delete(spark, dir, col("id") === 99 || col("id") === 0)
    val dt = DeltaTable.forPath(spark, dir)
    // count(*) may be served from DV-adjusted log stats; min/max must come
    // from the scan (the deleted rows WERE the extremes)
    val r = dt.toDF.agg(count(lit(1)), min("id"), max("id"))
      .as[(Long, Long, Long)].head()
    assert(r == ((98L, 1L, 98L)))
    assert(dt.statistics.numRecords.contains(98L))
  }

  test("OPTIMIZE compaction purges deletion vectors") {
    val dir = dvTable("dv-optimize")
    Dml.delete(spark, dir, col("id") % 10 === 0)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 90)
    val m = Optimize.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(m.filesRemoved >= 2)
    val dt = DeltaTable.forPath(spark, dir)
    assert(!DeletionVectors.anyDv(dt.files))
    assert(dt.toDF.count() == 90)
    assert(dt.toDF.filter(col("id") % 10 === 0).count() == 0)
  }

  test("copy-on-write DML after disabling DVs does not resurrect rows") {
    val dir = dvTable("dv-cow-after")
    Dml.delete(spark, dir, col("id") < 20)
    new DeltaTable(DeltaLog.forPath(spark, dir), DeltaLog.forPath(spark, dir).update())
      .setProperties(Map(TableConfig.EnableDeletionVectors -> "false"))
    // CoW update rewrites the DV'd files — deleted rows must stay deleted
    val m = Dml.update(spark, dir, col("id") < 30, Map("v" -> lit("x")))
    assert(m.rowsAffected == 10) // ids 20..29 only; 0..19 are gone
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.count() == 80)
    assert(!DeletionVectors.anyDv(dt.files)) // rewrite dropped the pointers
  }

  test("MERGE on a DV'd table sees the logical view") {
    val dir = dvTable("dv-merge")
    Dml.delete(spark, dir, col("id") < 50)
    val updates = Seq((10L, "resurrect?"), (60L, "merged")).toDF("id", "v")
    Merge.into(spark, dir, updates, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("v" -> col("s.v")))
      .whenNotMatchedInsertAll()
      .execute()
    val dt = DeltaTable.forPath(spark, dir)
    val vals = dt.toDF.filter(col("id").isin(10L, 60L))
      .orderBy("id").as[(Long, String)].collect()
    // id=10 was deleted → NOT MATCHED → inserted fresh; id=60 updated
    assert(vals.toSeq == Seq((10L, "resurrect?"), (60L, "merged")))
    assert(dt.toDF.count() == 51)
  }

  test("vacuum never touches DV directories; clone refuses DV snapshots") {
    val dir = dvTable("dv-vacuum")
    Dml.delete(spark, dir, col("id") < 10)
    val dropped = DeltaTable.forPath(spark, dir)
      .vacuum(retentionHours = 200, dryRun = true)
    assert(!dropped.exists(_.startsWith(DeletionVectors.Dir)))
    val ex = intercept[IllegalStateException] {
      Clone.shallow(spark, dir, tempTable("dv-clone-tgt").toString)
    }
    assert(ex.getMessage.contains("deletion vectors"))
  }

  test("DistributedReplay carries DV tags") {
    val dir = dvTable("dv-replay")
    Dml.delete(spark, dir, col("id") < 7)
    val log = DeltaLog.forPath(spark, dir)
    val adds = DistributedReplay.prunedAddActions(log)
    assert(adds.map(DeletionVectors.cardinality).sum == 7)
    assert(adds.exists(DeletionVectors.hasDv))
  }

  test("enabling DVs bumps minReaderVersion to fence foreign readers") {
    val dir = dvTable("dv-fence")
    val snap = DeltaLog.forPath(spark, dir).update()
    // a reader that doesn't know the graft DV tag extension would silently
    // resurrect deleted rows — version 3 (table-features floor) fences it
    assert(snap.minReaderVersion == 3)
    assert(snap.minWriterVersion >= 2)
    // our own replay is version-tolerant: reads keep working
    Dml.delete(spark, dir, col("id") < 5)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 95)
  }

  test("re-delete tombstones the superseded DV dir; vacuum reclaims it") {
    val dir = dvTable("dv-reclaim")
    Dml.delete(spark, dir, col("id") < 10)  // DV dir A
    val dirA = DeltaLog.forPath(spark, dir).update()
      .files.flatMap(DeletionVectors.dvPath).distinct
    assert(dirA.size == 1)
    Dml.delete(spark, dir, col("id") >= 10 && col("id") < 20) // supersedes → dir B
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val liveDirs = snap.files.flatMap(DeletionVectors.dvPath).toSet
    assert(!liveDirs.contains(dirA.head), "old dir must be fully superseded")
    // the superseding commit tombstoned dir A
    assert(snap.tombstones.exists(t => t.path == dirA.head && !t.dataChange))
    // fresh tombstone: not vacuum-eligible yet
    assert(!new DeltaTable(log, snap).vacuum(dryRun = true).contains(dirA.head))
    // age it via a hand-written expired tombstone, then vacuum for real
    writeCommit(java.nio.file.Paths.get(dir), snap.version + 1,
      Seq(remove(dirA.head, ts = System.currentTimeMillis() - 169L * 3600 * 1000)))
    val log2 = DeltaLog.forPath(spark, dir)
    val dt2 = new DeltaTable(log2, log2.update())
    val deleted = dt2.vacuum(retentionHours = 168, dryRun = false)
    assert(deleted.contains(dirA.head))
    val fs = log2.tablePath.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(log2.tablePath, dirA.head)))
    // dir B intact, logical view unharmed
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 80)
    assert(DeltaTable.forPath(spark, dir).toDF.filter(col("id") < 20).count() == 0)
  }

  test("DV read plan: path restriction is a broadcast join, not an In literal") {
    val dir = dvTable("dv-planshape")
    Dml.delete(spark, dir, col("id") < 10)
    val df = DeltaTable.forPath(spark, dir).toDF
    assert(df.count() == 90) // materialize with AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    // the anti-join subtracts DV rows; the DV frame restricts its paths via
    // a broadcast semi-join — an `In`-literal over 10⁵⁺ paths would be a
    // planner/driver killer at scale
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast join in the DV plan:\n$plan")
    assert(!plan.contains("path#") || !plan.contains(" IN ("),
      "DV path restriction regressed to an In-literal")
  }

  test("restore to a pre-delete version resurrects DV'd rows (tag-aware diff)") {
    val dir = dvTable("dv-restore")
    val preDelete = DeltaLog.forPath(spark, dir).update().version
    val m = Dml.delete(spark, dir, col("id") < 10)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 90)

    val dvDir = DeltaLog.forPath(spark, dir).update()
      .files.flatMap(DeletionVectors.dvPath).distinct
    assert(dvDir.size == 1)

    // a path-only diff would see identical path sets and restore NOTHING,
    // silently keeping the deletion; the tag-aware diff re-adds the
    // tag-less entries
    val r = DeltaTable.forPath(spark, dir).restoreToVersion(preDelete)
    assert(r.filesRestored > 0)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.count() == 100)
    assert(!dt.files.exists(DeletionVectors.hasDv))
    // the restore abandoned the DV dir its repointed entries referenced —
    // without a tombstone vacuum could never reclaim it (r6 ADVICE leak)
    assert(dt.snapshot.tombstones.exists(t => t.path == dvDir.head && !t.dataChange),
      s"restore must tombstone the abandoned DV dir ${dvDir.head}")

    // and restoring forward to the post-delete version re-applies the DVs;
    // the dir is live again and vacuum's liveDvDirs guard protects it from
    // the (now-stale) tombstone
    DeltaTable.forPath(spark, dir).restoreToVersion(m.version)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 90)
    assert(!DeltaTable.forPath(spark, dir)
      .vacuum(retentionHours = 168, dryRun = true).contains(dvDir.head))
  }

  test("incremental feeds skip pointer-only re-adds") {
    val dir = dvTable("dv-feed")
    val v0 = DeltaLog.forPath(spark, dir).update().version
    Dml.delete(spark, dir, col("id") < 10) // DV re-add commit
    GraftWriter.write(Seq((500L, "new")).toDF("id", "v"), dir, SaveMode.Append)
    val changes = spark.sql(
      s"SELECT * FROM graft_changes('$dir', $v0)")
    // only the genuine append surfaces; the DV re-adds of 100 old rows don't
    assert(changes.count() == 1)
    assert(changes.select("id").as[Long].head() == 500L)
  }

  test("DV enable on a table-features protocol declares standard deletionVectors (r11)") {
    // a (r,7)-features table (ICT first) then the bare enable property: the
    // old fence no-op'd (minReader already 3 impossible here, but features
    // lists defined) and DML wrote graft tags a spec-compliant foreign
    // reader would IGNORE — silently resurrecting every deleted row
    val dir = tempTable("dv-feature-fence").toString
    GraftWriter.write((0 until 60).map(i => (i.toLong, s"n$i")).toDF("id", "v")
      .repartition(2), dir)
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.EnableInCommitTimestamps -> "true")) // lifts to writer 7
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.EnableDeletionVectors -> "true"))
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.readerFeatures.exists(_.contains("deletionVectors")) &&
           snap.writerFeatures.exists(_.contains("deletionVectors")),
      s"features table must declare standard DVs, got ${snap.readerFeatures}/${snap.writerFeatures}")
    Dml.delete(spark, dir, col("id") < 20)
    val after = DeltaLog.forPath(spark, dir).update()
    assert(after.files.exists(_.deletionVector.isDefined),
      "DML must emit standard descriptors on the fenced table")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 40)
  }

  test("dotted column names survive DV scans and DML (r11 quoting)") {
    val dir = tempTable("dv-dotted").toString
    GraftWriter.write((0 until 50).map(i => (i.toLong, s"x$i"))
      .toDF("id", "a.b").repartition(2), dir)
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.EnableDeletionVectors -> "true"))
    Dml.delete(spark, dir, col("id") < 10)
    val df = DeltaTable.forPath(spark, dir).toDF
    assert(df.count() == 40)
    assert(df.select(col("`a.b`")).as[String].collect().toSet ==
      (10 until 50).map(i => s"x$i").toSet)
  }

  test("relPath of a bucket-root table keeps the partition dir (r11)") {
    // prefix "/" would substring_index at the LAST slash → file name only
    val rows = Seq("s3a://bucket/p=1/part-x.parquet",
                   "file:///p=2/part-y.parquet").toDF("fp")
    val got = rows.select(DeletionVectors.relPathFromPrefix("/", col("fp")).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("p=1/part-x.parquet", "p=2/part-y.parquet"), got.toString)
    // the normal (non-root) prefix path is unchanged
    val normal = rows.limit(1).select(DeletionVectors.relPathFromPrefix(
      "/bucket/", col("fp")).as("r")).as[String].head()
    assert(normal == "p=1/part-x.parquet")
  }
}
