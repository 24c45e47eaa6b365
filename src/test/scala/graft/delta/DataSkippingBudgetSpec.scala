package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `delta.dataSkippingNumIndexedCols`: per-file stats are collected for
  * only the first n top-level columns — at 100 TB a 500-column table's
  * full stats dominate the log. numRecords is always recorded. */
class DataSkippingBudgetSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def wide(n: Int) = {
    val base = (0 until 20).map(i => i.toLong).toDF("c0").repartition(1)
    (1 until n).foldLeft(base)((d, i) => d.withColumn(s"c$i", col("c0") + i))
  }

  private def statsOf(dir: String): FileStats = {
    val snap = DeltaLog.forPath(spark, dir).update()
    snap.files.head.stats.flatMap(ActionCodec.statsFromJson).get
  }

  test("default budget is 32 columns; numRecords always present") {
    val dir = tempTable("skip-default").toString
    GraftWriter.write(wide(40), dir)
    val s = statsOf(dir)
    assert(s.numRecords == 20)
    assert(s.minValues.keySet == (0 until 32).map(i => s"c$i").toSet)
    assert(s.nullCount.keySet.size == 32)
  }

  test("explicit budget bounds stats; -1 is unbounded; scans stay exact") {
    val dir3 = tempTable("skip-three").toString
    GraftWriter.write(wide(10), dir3,
      configuration = Some(Map(TableConfig.DataSkippingNumIndexedCols -> "3")))
    val s3 = statsOf(dir3)
    assert(s3.minValues.keySet == Set("c0", "c1", "c2"))
    // un-indexed columns still answer exactly (stats are a pruning aid,
    // never the data)
    assert(DeltaTable.forPath(spark, dir3).toDF
      .agg(sum(col("c9"))).head().getLong(0) == (0 until 20).map(_ + 9).sum)

    val dirAll = tempTable("skip-all").toString
    GraftWriter.write(wide(40), dirAll,
      configuration = Some(Map(TableConfig.DataSkippingNumIndexedCols -> "-1")))
    assert(statsOf(dirAll).minValues.keySet.size == 40)
  }

  test("the budget follows ALTER and governs appends, DML rewrites inherit it") {
    val dir = tempTable("skip-alter").toString
    GraftWriter.write(wide(10), dir)
    assert(statsOf(dir).minValues.keySet.size == 10)
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.DataSkippingNumIndexedCols -> "2"))
    GraftWriter.write(wide(10), dir, SaveMode.Append)
    val snap = DeltaLog.forPath(spark, dir).update()
    val perFile = snap.files.flatMap(_.stats).flatMap(ActionCodec.statsFromJson)
      .map(_.minValues.keySet.size).sorted
    assert(perFile == Seq(2, 10)) // old file keeps old stats, new file budgeted
    // a CoW rewrite under the budget emits budgeted stats too
    Dml.update(spark, dir, col("c0") === 0L, Map("c1" -> lit(999L)))
    val after = DeltaLog.forPath(spark, dir).update()
    assert(after.files.flatMap(_.stats).flatMap(ActionCodec.statsFromJson)
      .forall(_.minValues.keySet.size <= 10))
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 40)
  }
}
