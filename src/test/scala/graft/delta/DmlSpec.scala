package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DmlSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("DELETE removes matching rows and only rewrites affected files") {
    val dir = tempTable("dml-delete").toString
    // two disjoint-range files: the predicate only touches one
    GraftWriter.write((0 until 50).map(i => (i.toLong, s"n$i")).toDF("id", "v")
      .repartition(1), dir)
    GraftWriter.write((1000 until 1050).map(i => (i.toLong, s"n$i")).toDF("id", "v")
      .repartition(1), dir, SaveMode.Append)
    val untouched = DeltaTable.forPath(spark, dir).files
      .find(_.stats.exists(_.contains("1000"))).get.path

    val m = Dml.delete(spark, dir, col("id") < 10)
    assert(m.filesRewritten == 1 && m.rowsAffected == 10)

    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.count() == 90)
    assert(dt.toDF.filter(col("id") < 10).count() == 0)
    assert(dt.files.map(_.path).contains(untouched)) // second file untouched
    // pre-delete version still time-travels
    assert(DeltaTable.forPath(spark, dir, m.version - 1).toDF.count() == 100)
  }

  test("DELETE with no matches is a no-op") {
    val dir = tempTable("dml-noop").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val m = Dml.delete(spark, dir, col("id") > 100)
    assert(m.filesRewritten == 0 && m.rowsAffected == 0)
    assert(DeltaTable.forPath(spark, dir).version == 0) // no commit
  }

  test("UPDATE rewrites matching rows in place, others untouched") {
    val dir = tempTable("dml-update").toString
    GraftWriter.write((0 until 30).map(i => (i.toLong, i * 1.0)).toDF("id", "price"), dir)
    val m = Dml.update(spark, dir, col("id") < 5,
      Map("price" -> (col("price") + 1000.0)))
    assert(m.rowsAffected == 5)
    val rows = DeltaTable.forPath(spark, dir).toDF
      .orderBy("id").as[(Long, Double)].collect()
    assert(rows.take(5).forall { case (id, p) => p == id + 1000.0 })
    assert(rows.drop(5).forall { case (id, p) => p == id.toDouble })
  }

  test("DELETE on a partitioned table preserves the layout") {
    val dir = tempTable("dml-part").toString
    GraftWriter.write((0 until 60).map(i => (i.toLong, i % 3)).toDF("id", "p"),
      dir, SaveMode.ErrorIfExists, Seq("p"))
    val m = Dml.delete(spark, dir, col("p") === 1 && col("id") < 30)
    assert(m.rowsAffected == 10)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.count() == 50)
    assert(dt.files.forall(_.partitionValues.keySet == Set("p")))
    assert(dt.toDF.filter(col("p") === 1).count() == 10) // 20 - 10 deleted
    assert(dt.toDF.filter(col("p") === 0).count() == 20) // untouched
  }

  test("NULL predicate rows are kept by DELETE (SQL semantics)") {
    val dir = tempTable("dml-null").toString
    GraftWriter.write(Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "x"), dir)
    Dml.delete(spark, dir, col("x") > 2.0)
    val ids = DeltaTable.forPath(spark, dir).toDF
      .select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L)) // null-x row kept
  }

  test("UPDATE SET expressions and WHERE all see the PRE-update row (swap)") {
    // regression: a sequential withColumn fold let `SET a = b, b = a`
    // collapse both columns to b, and `SET ts = 20 WHERE ts = 10` broke
    // later assignments' predicates — SQL evaluates everything against the
    // old row. Covers the copy-on-write path and the DV (merge-on-read)
    // path, which shares applyAssignments with lit(true).
    for (dv <- Seq(false, true)) {
      val dir = tempTable(s"dml-swap-$dv").toString
      GraftWriter.write(Seq((1L, 10L, 100L), (2L, 20L, 200L)).toDF("id", "a", "b"), dir)
      if (dv) DeltaTable.forPath(spark, dir)
        .setProperties(Map(TableConfig.EnableDeletionVectors -> "true"))
      val m = Dml.update(spark, dir, col("a") === 10L,
        Map("a" -> col("b"), "b" -> col("a")))
      assert(m.rowsAffected == 1, s"dv=$dv: $m")
      val rows = DeltaTable.forPath(spark, dir).toDF
        .select("id", "a", "b").as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(rows == Seq((1L, 100L, 10L), (2L, 20L, 200L)), s"dv=$dv: $rows")
    }
  }
}
