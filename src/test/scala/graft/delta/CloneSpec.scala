package graft.delta

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SHALLOW CLONE: zero-copy table forks with fully independent lives. */
class CloneSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def ids(dir: String): Seq[Long] =
    DeltaTable.forPath(spark, dir).toDF.select("id").as[Long].collect().sorted.toSeq

  test("clone reads the source snapshot without copying a byte") {
    val src = tempTable("clone-src").toString
    val dst = tempTable("clone-dst").toString
    GraftWriter.write((0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4), src)

    assert(Clone.shallow(spark, src, dst) == 0)
    assert(ids(dst) == (0L until 100L))
    // no parquet landed under the clone
    val fs = new Path(dst).getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(new Path(dst), true)
    var dataFiles = 0
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) dataFiles += 1 }
    assert(dataFiles == 0)
    // stats carried over: exact row count from the log alone
    assert(DeltaTable.forPath(spark, dst).statistics.numRecords.contains(100L))
  }

  test("clone and source diverge independently") {
    val src = tempTable("clone-div-src").toString
    val dst = tempTable("clone-div-dst").toString
    GraftWriter.write((0 until 50).map(i => (i.toLong, "x")).toDF("id", "v"), src)
    Clone.shallow(spark, src, dst)

    GraftWriter.write(Seq((500L, "src-only")).toDF("id", "v"), src, SaveMode.Append)
    GraftWriter.write(Seq((900L, "dst-only")).toDF("id", "v"), dst, SaveMode.Append)
    assert(ids(src) == ((0L until 50L) :+ 500L))
    assert(ids(dst) == ((0L until 50L) :+ 900L))
  }

  test("DML on the clone never touches source bytes") {
    val src = tempTable("clone-dml-src").toString
    val dst = tempTable("clone-dml-dst").toString
    GraftWriter.write((0 until 50).map(i => (i.toLong, "x")).toDF("id", "v")
      .repartition(2), src)
    Clone.shallow(spark, src, dst)

    assert(Dml.delete(spark, dst, col("id") < 25).rowsAffected == 25)
    assert(ids(dst) == (25L until 50L))
    assert(ids(src) == (0L until 50L)) // source sees everything

    // vacuum on the clone (floor lowered) reclaims nothing of the source
    DeltaTable.forPath(spark, dst).setProperties(
      Map(TableConfig.DeletedFileRetention -> "interval 0 hours"))
    DeltaTable.forPath(spark, dst).vacuum()
    assert(ids(src) == (0L until 50L)) // still intact after clone vacuum
  }

  test("clone of a pinned historical version") {
    val src = tempTable("clone-ver-src").toString
    val dst = tempTable("clone-ver-dst").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), src)
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), src, SaveMode.Append)
    Clone.shallow(spark, src, dst, version = Some(0))
    assert(ids(dst) == Seq(1L))
  }

  test("clone target must be empty; clone of a clone works") {
    val src = tempTable("clone2-src").toString
    val dst = tempTable("clone2-dst").toString
    val dst2 = tempTable("clone2-dst2").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), src)
    Clone.shallow(spark, src, dst)
    intercept[IllegalStateException](Clone.shallow(spark, src, dst))
    // second-order clone resolves the (already absolute) paths unchanged
    Clone.shallow(spark, dst, dst2)
    assert(ids(dst2) == Seq(1L))
  }
}
