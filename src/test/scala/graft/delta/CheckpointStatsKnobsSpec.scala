package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** `delta.checkpoint.writeStatsAsJson` / `writeStatsAsStruct`: shrink
  * checkpoint add rows at the documented cost of skipping/stat answers
  * for snapshots restored from them. Defaults keep both shapes (graft's
  * historical behavior). */
class CheckpointStatsKnobsSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def cpDf(dir: String) = {
    val log = DeltaLog.forPath(spark, dir)
    val cp = log.checkpoint()
    spark.read.parquet(log.checkpointPaths(cp).head.toString)
  }

  test("defaults write both the stats string and stats_parsed") {
    val dir = tempTable("cpstats-default").toString
    GraftWriter.write((0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1), dir)
    val df = cpDf(dir)
    assert(df.schema("add").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("stats_parsed"))
    assert(df.filter(col("add").isNotNull)
      .filter(col("add.stats").isNotNull).count() == 1)
    assert(df.filter(col("add.stats_parsed.numRecords") === 20).count() == 1)
  }

  test("disabling both drops them; restored snapshots still serve exactly") {
    val dir = tempTable("cpstats-off").toString
    GraftWriter.write((0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1), dir,
      configuration = Some(Map(
        TableConfig.CheckpointWriteStatsAsJson -> "false",
        TableConfig.CheckpointWriteStatsAsStruct -> "false")))
    val df = cpDf(dir)
    assert(!df.schema("add").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("stats_parsed"))
    assert(df.filter(col("add").isNotNull)
      .filter(col("add.stats").isNotNull).count() == 0)
    // cold load restores WITHOUT stats — row answers must stay exact
    // (stats are a pruning aid, never the data)
    // uncached: the claim is the RESTORE serves stats-free adds — the warm
    // writer handle still holds the footer stats in memory
    val cold = DeltaLog.forPathUncached(spark, dir).update()
    assert(cold.files.head.stats.isEmpty)
    assert(DeltaTable.forPathUncached(spark, dir).toDF.count() == 20)
    assert(DeltaTable.forPathUncached(spark, dir).toDF
      .filter(col("id") >= 10).count() == 10)
    // and the statistics fold degrades honestly (no exact numRecords) —
    // uncached: the warm writer handle still holds the footer stats
    assert(DeltaTable.forPathUncached(spark, dir).statistics.numRecords.isEmpty)
  }
}
