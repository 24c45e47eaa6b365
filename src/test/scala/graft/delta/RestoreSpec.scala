package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** RESTORE: rewind live state to a historical version via one diff commit. */
class RestoreSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def ids(dir: String): Seq[Long] =
    DeltaTable.forPath(spark, dir).toDF.select("id").as[Long].collect().sorted.toSeq

  test("restore undoes appends and deletes; history is preserved") {
    val dir = tempTable("restore-basic").toString
    GraftWriter.write((0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir) // v0
    GraftWriter.write((100 until 150).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      dir, SaveMode.Append) // v1
    Dml.delete(spark, dir, col("id") < 20) // v2
    assert(ids(dir) == (20L until 150L))

    val m = DeltaTable.forPath(spark, dir).restoreToVersion(0)
    assert(m.version == 3)
    assert(m.filesRestored > 0 && m.filesRemoved > 0)
    assert(ids(dir) == (0L until 100L))
    // nothing rewritten: v2 still time-travels
    assert(DeltaTable.forPath(spark, dir, 2).toDF.count() == 130)
    // restore of the restore: back to the deleted state
    DeltaTable.forPath(spark, dir).restoreToVersion(2)
    assert(ids(dir) == (20L until 150L))
  }

  test("restore to the current version is a no-op") {
    val dir = tempTable("restore-noop").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val m = DeltaTable.forPath(spark, dir).restoreToVersion(0)
    assert(m == RestoreMetrics(0, 0, 0))
    assert(DeltaLog.forPath(spark, dir).update().version == 0)
  }

  test("restore reverts evolved schema and table properties") {
    val dir = tempTable("restore-schema").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir) // v0
    GraftWriter.write(Seq((2L, "b", 1.5)).toDF("id", "v", "w"),
      dir, SaveMode.Append, mergeSchema = true) // v1
    DeltaTable.forPath(spark, dir).setProperties(Map(TableConfig.CheckpointInterval -> "5")) // v2
    assert(DeltaTable.forPath(spark, dir).schema.fieldNames.toSeq == Seq("id", "v", "w"))

    DeltaTable.forPath(spark, dir).restoreToVersion(0)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(TableConfig.of(dt.snapshot) == Map.empty)
    assert(dt.toDF.as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("restore past a vacuum fails with the missing files") {
    val dir = tempTable("restore-vacuumed").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, "x")).toDF("id", "v"), dir) // v0
    GraftWriter.write(Seq((99L, "y")).toDF("id", "v"), dir, SaveMode.Overwrite) // v1
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.DeletedFileRetention -> "interval 0 hours")) // v2
    assert(DeltaTable.forPath(spark, dir).vacuum().nonEmpty)
    val e = intercept[RestoreException](DeltaTable.forPath(spark, dir).restoreToVersion(0))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("restoreToTimestamp resolves through the commit-time index") {
    val dir = tempTable("restore-ts").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir) // v0
    val log = DeltaLog.forPath(spark, dir)
    val t0 = log.versionTimestamp(0)
    val fs = log.logPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.setTimes(log.commitFile(0), t0 - 10000, -1)
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append) // v1
    DeltaTable.forPath(spark, dir).restoreToTimestamp(t0 - 10000)
    assert(ids(dir) == Seq(1L))
  }

  test("restored table keeps working: appends and DML on top") {
    val dir = tempTable("restore-continue").toString
    GraftWriter.write((0 until 50).map(i => (i.toLong, "x")).toDF("id", "v"), dir)
    Dml.update(spark, dir, col("id") < 10, Map("v" -> lit("y")))
    DeltaTable.forPath(spark, dir).restoreToVersion(0)
    GraftWriter.write(Seq((100L, "z")).toDF("id", "v"), dir, SaveMode.Append)
    assert(Dml.delete(spark, dir, col("id") >= 40 && col("id") < 50).rowsAffected == 10)
    assert(ids(dir) == ((0L until 40L) :+ 100L))
    assert(DeltaTable.forPath(spark, dir).toDF
      .filter(col("v") === "y").count() == 0)
  }
}
