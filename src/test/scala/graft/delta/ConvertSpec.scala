package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CONVERT TO DELTA: in-place adoption of existing parquet directories. */
class ConvertSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("flat parquet dir converts in place; table is fully operable after") {
    val dir = tempTable("convert-flat").toString
    (0 until 200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4).write.mode("overwrite").parquet(dir)

    val v = Convert.parquetToDelta(spark, dir)
    assert(v == 0)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.count() == 200)
    assert(dt.schema.fieldNames.toSeq == Seq("id", "v"))
    // stats landed: statistics fold to the exact row count
    assert(dt.statistics.numRecords.contains(200L))

    // the converted table takes appends and DML like any other
    GraftWriter.write(Seq((500L, "new")).toDF("id", "v"), dir, SaveMode.Append)
    assert(Dml.delete(spark, dir, col("id") < 100).rowsAffected == 100)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 101)
    // and time-travels back to the converted state
    assert(DeltaTable.forPath(spark, dir, 0).toDF.count() == 200)
  }

  test("converting tz-naive parquet declares the timestampNtz feature (round 11)") {
    val dir = tempTable("convert-ntz").toString
    Seq((1L, "2024-01-02 03:04:05"), (2L, "2024-06-07 08:09:10"))
      .toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp_ntz").as("ts"))
      .repartition(2).write.mode("overwrite").parquet(dir)

    Convert.parquetToDelta(spark, dir)
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.metadata.get.schemaString.contains("timestamp_ntz"))
    // the inferred NTZ column fences the protocol — a bare legacy (1,2)
    // protocol would let feature-unaware readers misread the column
    assert(snap.readerFeatures.exists(_.contains("timestampNtz")) &&
           snap.writerFeatures.exists(_.contains("timestampNtz")))
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 2)
  }

  test("hive-partitioned dir converts with typed partition columns") {
    val dir = tempTable("convert-part").toString
    (0 until 90).map(i => (i.toLong, i % 3)).toDF("id", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)

    Convert.parquetToDelta(spark, dir, partitionBy = Seq("p"))
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.partitionColumns == Seq("p"))
    assert(dt.schema("p").dataType == org.apache.spark.sql.types.IntegerType)
    assert(dt.toDF.count() == 90)
    // partition pruning works immediately
    assert(dt.toDF(Seq(PartitionFilter.Eq("p", "1"))).count() == 30)
    assert(dt.files.forall(_.partitionValues.keySet == Set("p")))
  }

  test("refuses an existing Delta table and bad partition columns") {
    val dir = tempTable("convert-bad").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    intercept[IllegalStateException](Convert.parquetToDelta(spark, dir))

    val flat = tempTable("convert-bad2").toString
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(flat)
    intercept[IllegalArgumentException](
      Convert.parquetToDelta(spark, flat, partitionBy = Seq("nope")))
  }

  test("stats-based skipping works from version 0") {
    val dir = tempTable("convert-skip").toString
    (0 until 100).map(i => (i.toLong, "x")).toDF("id", "v")
      .orderBy("id").coalesce(1).write.mode("overwrite").parquet(dir)
    (100 until 200).map(i => (i.toLong, "y")).toDF("id", "v")
      .orderBy("id").coalesce(1).write.mode("append").parquet(dir)

    Convert.parquetToDelta(spark, dir)
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.files.size == 2)
    val pruned = StatsPredicate.prune(snap.files,
      Seq(StatsPredicate.Ge("id", 150L)))
    assert(pruned.size == 1, s"expected one surviving file, got ${pruned.size}")
  }
}
