package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CBO statistics: a graft-delta scan advertises the log's exact row count
  * to the plan-stats machinery, full-table and pruned. */
class RelationStatsSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def withCbo[A](body: => A): A = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try body finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  private def relStats(df: DataFrame) = {
    val rels = df.queryExecution.optimizedPlan.collect { case lr: LogicalRelation => lr }
    assert(rels.size == 1)
    rels.head.stats
  }

  test("scan advertises exact rowCount under CBO") {
    val dir = tempTable("cbo-rowcount").toString
    GraftWriter.write((0 until 100).map(i => (i.toLong, i % 5)).toDF("id", "p"),
      dir, SaveMode.ErrorIfExists, Seq("p"))
    withCbo {
      val st = relStats(DeltaTable.forPath(spark, dir).toDF)
      assert(st.rowCount.contains(BigInt(100)), s"stats=$st")
    }
  }

  test("without CBO/planStats the scan keeps plain file-size stats") {
    val dir = tempTable("cbo-off").toString
    GraftWriter.write((0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir)
    val st = relStats(DeltaTable.forPath(spark, dir).toDF)
    assert(st.rowCount.isEmpty)
    assert(st.sizeInBytes > 0)
  }

  test("pruned scan re-scopes rowCount to the pruned file set") {
    val dir = tempTable("cbo-pruned").toString
    GraftWriter.write((0 until 1000).map(i => (i.toLong, i % 10)).toDF("id", "p"),
      dir, SaveMode.ErrorIfExists, Seq("p"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PruneGraftScans
    try withCbo {
      val dt = DeltaTable.forPath(spark, dir)
      val pruned = relStats(dt.toDF.filter(col("p") === 3))
      assert(pruned.rowCount.contains(BigInt(100)), s"stats=$pruned")
      assert(relStats(dt.toDF).rowCount.contains(BigInt(1000)))
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == PruneGraftScans)
  }
}
