package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsOnlyAggregatesSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ StatsOnlyAggregates
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == StatsOnlyAggregates)
  }

  private def isMetadataOnly(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst { case _: LocalRelation => () }.isDefined

  test("min/max/count over a delta scan answers from the log, no file scan (datafusion_test.rs:57-117)") {
    val dir = tempTable("statsagg").toString
    GraftWriter.write((0 until 100).map(i => (i.toLong, i * 2.5, s"n$i")).toDF("id", "v", "name"), dir)
    GraftWriter.write((100 until 150).map(i => (i.toLong, i * 2.5, s"n$i")).toDF("id", "v", "name"),
      dir, SaveMode.Append)
    val dt = DeltaTable.forPath(spark, dir)

    withRule {
      val df = dt.toDF.agg(
        min($"id").as("min_id"), max($"id").as("max_id"),
        min($"v").as("min_v"), max($"v").as("max_v"),
        count(lit(1)).as("n"))
      assert(isMetadataOnly(df), df.queryExecution.optimizedPlan.toString)
      val r = df.collect().head
      assert(r.getAs[Long]("min_id") == 0L && r.getAs[Long]("max_id") == 149L)
      assert(r.getAs[Double]("min_v") == 0.0 && r.getAs[Double]("max_v") == 372.5)
      assert(r.getAs[Long]("n") == 150L)
    }
  }

  test("count(col) uses nullCount") {
    val dir = tempTable("statsagg-nulls").toString
    val df0 = Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None))
      .toDF("id", "s")
    GraftWriter.write(df0, dir)
    val dt = DeltaTable.forPath(spark, dir)
    withRule {
      val df = dt.toDF.agg(count($"s").as("n_s"), count(lit(1)).as("n"))
      assert(isMetadataOnly(df))
      val r = df.collect().head
      assert(r.getAs[Long]("n_s") == 2L && r.getAs[Long]("n") == 4L)
    }
  }

  test("filters below the aggregate prevent the rewrite; results stay correct") {
    val dir = tempTable("statsagg-filter").toString
    GraftWriter.write((0 until 50).map(i => (i.toLong, s"x$i")).toDF("id", "name"), dir)
    val dt = DeltaTable.forPath(spark, dir)
    withRule {
      val df = dt.toDF.filter($"id" >= 25).agg(min($"id").as("m"), count(lit(1)).as("n"))
      assert(!isMetadataOnly(df))
      val r = df.collect().head
      assert(r.getAs[Long]("m") == 25L && r.getAs[Long]("n") == 25L)
    }
  }

  test("string min/max is NOT answered from stats (truncation hazard)") {
    val dir = tempTable("statsagg-str").toString
    GraftWriter.write(Seq((1L, "abc"), (2L, "zzz")).toDF("id", "name"), dir)
    val dt = DeltaTable.forPath(spark, dir)
    withRule {
      val df = dt.toDF.agg(max($"name").as("m"))
      assert(!isMetadataOnly(df))
      assert(df.collect().head.getAs[String]("m") == "zzz") // still correct via scan
    }
  }

  test("distinct aggregates are never rewritten") {
    val dir = tempTable("statsagg-distinct").toString
    GraftWriter.write(Seq((1L, 1L), (2L, 1L)).toDF("id", "v"), dir)
    val dt = DeltaTable.forPath(spark, dir)
    withRule {
      val df = dt.toDF.agg(countDistinct($"v").as("d"))
      assert(!isMetadataOnly(df))
      assert(df.collect().head.getAs[Long]("d") == 1L)
    }
  }

  test("rewrite matches the scanned answer on testdata lineitem (consistency)") {
    val dir = tempTable("statsagg-consistency").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    GraftWriter.write(li, dir)
    val dt = DeltaTable.forPath(spark, dir)
    val expected = li.agg(min($"l_quantity"), max($"l_quantity"), count(lit(1))).collect().head
    withRule {
      val df = dt.toDF.agg(min($"l_quantity"), max($"l_quantity"), count(lit(1)))
      assert(isMetadataOnly(df))
      assert(df.collect().head == expected)
    }
  }
}
