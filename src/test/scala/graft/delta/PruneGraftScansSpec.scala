package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PruneGraftScansSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PruneGraftScans
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == PruneGraftScans)
  }

  private def scanSize(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.sizeInBytes
        case _ => -1L
      }
    }.head

  test("partition filter shrinks the scan's plan-time sizeInBytes") {
    val dir = tempTable("prune-size-part").toString
    GraftWriter.write((0 until 1000).map(i => (i.toLong, i % 10)).toDF("id", "p"),
      dir, SaveMode.ErrorIfExists, Seq("p"))
    val dt = DeltaTable.forPath(spark, dir)
    val full = scanSize(dt.toDF)
    withRule {
      val pruned = scanSize(dt.toDF.filter(col("p") === 3))
      assert(pruned < full / 5, s"pruned=$pruned full=$full")
      // semantics unchanged
      assert(dt.toDF.filter(col("p") === 3).count() == 100)
    }
  }

  test("stats filter on disjoint-range files shrinks sizeInBytes") {
    val dir = tempTable("prune-size-stats").toString
    GraftWriter.write((0 until 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1), dir)
    GraftWriter.write((10000 until 10500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1), dir, SaveMode.Append)
    val dt = DeltaTable.forPath(spark, dir)
    val full = scanSize(dt.toDF)
    withRule {
      val pruned = scanSize(dt.toDF.filter(col("id") < 100))
      assert(pruned < full, s"pruned=$pruned full=$full")
      assert(dt.toDF.filter(col("id") < 100).count() == 100)
    }
  }

  test("a pruned delta side auto-broadcasts in a join") {
    val dir = tempTable("prune-bcast").toString
    GraftWriter.write((0 until 20000).map(i => (i.toLong, i % 100)).toDF("id", "p"),
      dir, SaveMode.ErrorIfExists, Seq("p"))
    val big = spark.range(0, 100000).select(col("id").as("rid"))
    val dt = DeltaTable.forPath(spark, dir)
    withRule {
      val threshold = scanSize(dt.toDF.filter(col("p") === 7)) + 1024
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> threshold.toString) {
        // full-table side exceeds the threshold…
        val unpruned = big.join(dt.toDF, col("rid") === col("id"))
        assert(!unpruned.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
        // …the pruned side fits under it and broadcasts
        val pruned = big.join(dt.toDF.filter(col("p") === 7), col("rid") === col("id"))
        assert(pruned.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
      }
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
