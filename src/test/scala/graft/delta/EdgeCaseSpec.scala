package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EdgeCaseSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("distributed checkpoint restore equals the driver path exactly") {
    val dir = tempTable("edge-dist-restore").toString
    // a table with removes (DML), metadata, txns and a checkpoint: every
    // snapshot component must survive the executor-side restore
    GraftWriter.write((0 until 60).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(3), dir)
    (1 to 9).foreach(i => GraftWriter.write(
      Seq((100L + i, s"a$i")).toDF("id", "v"), dir, SaveMode.Append))
    Dml.delete(spark, dir, col("id") < 10) // tombstones in the checkpoint
    val log0 = DeltaLog.forPath(spark, dir)
    log0.checkpoint()
    GraftWriter.write(Seq((500L, "tail")).toDF("id", "v"), dir, SaveMode.Append)

    def freshSnap() = DeltaLog.forPath(spark, dir).update()
    val driver = freshSnap() // default threshold: driver path
    spark.conf.set(DeltaLog.DistributedThresholdKey, "1")
    val dist = try freshSnap()
    finally spark.conf.unset(DeltaLog.DistributedThresholdKey)

    assert(dist.version == driver.version)
    assert(dist.files.map(f => (f.path, f.size, f.partitionValues, f.stats)).toSet ==
      driver.files.map(f => (f.path, f.size, f.partitionValues, f.stats)).toSet)
    assert(dist.tombstones.map(_.path).toSet == driver.tombstones.map(_.path).toSet)
    assert(dist.metadata.map(_.schemaString) == driver.metadata.map(_.schemaString))
    assert(dist.minReaderVersion == driver.minReaderVersion)
    // and the data read through the distributed-restored snapshot agrees
    assert(new DeltaTable(DeltaLog.forPath(spark, dir), dist).toDF.count() ==
      new DeltaTable(DeltaLog.forPath(spark, dir), driver).toDF.count())
  }

  test("above-threshold restore never materializes the checkpoint on the driver") {
    val dir = tempTable("edge-dist-nodriver").toString
    GraftWriter.write((0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4), dir)
    (1 to 5).foreach(i => GraftWriter.write(
      Seq((100L + i, s"a$i")).toDF("id", "v"), dir, SaveMode.Append))
    DeltaLog.forPath(spark, dir).checkpoint()

    // size ≥ threshold ⇒ the add-set resolves on the executors
    // (DistributedReplay) + readNonAdd; Checkpoints.read (the driver-side
    // full collect) must not run at all
    spark.conf.set(DeltaLog.DistributedThresholdKey, "1")
    try {
      val before = Checkpoints.driverReads.get()
      val snap = DeltaLog.forPath(spark, dir).update()
      assert(Checkpoints.driverReads.get() == before,
        "driver-side Checkpoints.read ran on an above-threshold restore")
      assert(snap.files.nonEmpty && snap.metadata.nonEmpty)
      assert(new DeltaTable(DeltaLog.forPath(spark, dir), snap).toDF.count() == 45)
    } finally spark.conf.unset(DeltaLog.DistributedThresholdKey)
  }

  test("zero-row write creates a readable empty table; DML and checkpoint no-op on it") {
    val dir = tempTable("edge-empty-table").toString
    GraftWriter.write(Seq.empty[(Long, String)].toDF("id", "v"), dir)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.version == 0)
    assert(dt.toDF.count() == 0)
    assert(dt.toDF.schema.fieldNames.toSeq == Seq("id", "v"))
    // DML on the empty table: clean no-ops, not errors
    assert(Dml.delete(spark, dir, col("id") > 0).rowsAffected == 0)
    assert(Dml.update(spark, dir, col("id") > 0, Map("v" -> lit("x"))).rowsAffected == 0)
    // checkpoint + fresh restore of the zero-row state (the write commits
    // one empty parquet file with numRecords=0 footer stats — protocol-legal)
    DeltaLog.forPath(spark, dir).checkpoint()
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.metadata.nonEmpty)
    assert(snap.statistics.numRecords.contains(0L))
    // and appends still work afterwards
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir, SaveMode.Append)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)
  }

  test("null partition values round-trip as __HIVE_DEFAULT_PARTITION__") {
    val dir = tempTable("edge-nullpart").toString
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a")), (4L, None))
      .toDF("id", "p")
    GraftWriter.write(df, dir, SaveMode.ErrorIfExists, Seq("p"))
    val dt = DeltaTable.forPath(spark, dir)
    // the log carries null partition values, not the sentinel string
    assert(dt.files.exists(_.partitionValues("p") == null))
    assert(dt.files.exists(_.partitionValues("p") == "a"))
    val back = dt.toDF
    assert(back.count() == 4)
    assert(back.filter(col("p").isNull).select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    // equality partition filter never matches the null partition (reference semantics)
    assert(dt.toDF(Seq(PartitionFilter.Eq("p", "a"))).count() == 2)
    // Catalyst-pushed IS NULL also resolves correctly through the index
    assert(dt.toDF.filter(col("p").isNull).count() == 2)
  }

  test("array/map/struct columns round-trip; footer stats skip nested gracefully") {
    val dir = tempTable("edge-complex").toString
    val df = Seq(
      (1L, Seq(1, 2, 3), Map("k" -> 1L), ("x", 10)),
      (2L, Seq.empty[Int], Map.empty[String, Long], ("y", 20)))
      .toDF("id", "arr", "m", "st")
    GraftWriter.write(df, dir)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.schema("arr").dataType.typeName == "array")
    assert(dt.schema("m").dataType.typeName == "map")
    assert(dt.schema("st").dataType.typeName == "struct")
    val rows = dt.toDF.orderBy("id").collect()
    assert(rows(0).getAs[scala.collection.Seq[Int]]("arr").toSeq == Seq(1, 2, 3))
    assert(rows(0).getAs[scala.collection.Map[String, Long]]("m").toMap == Map("k" -> 1L))
    assert(rows(1).getAs[scala.collection.Seq[Int]]("arr").isEmpty)
    // stats exist and carry the top-level primitive column
    val st = dt.statistics
    assert(st.numRecords.contains(2L))
    assert(st.minValues.contains("id") && !st.minValues.contains("arr"))
  }

  test("decimal and date columns round-trip through writer and scan") {
    val dir = tempTable("edge-decimal").toString
    val df = Seq(
      (1L, BigDecimal("12345.67"), java.sql.Date.valueOf("2021-03-04")),
      (2L, BigDecimal("-0.01"), java.sql.Date.valueOf("1999-12-31")))
      .toDF("id", "dec", "dt")
    GraftWriter.write(df, dir)
    val back = DeltaTable.forPath(spark, dir).toDF.orderBy("id").collect()
    assert(back(0).getAs[java.math.BigDecimal]("dec").toPlainString.startsWith("12345.67"))
    assert(back(1).getAs[java.sql.Date]("dt") == java.sql.Date.valueOf("1999-12-31"))
    // date min/max land in stats as ISO strings → usable for skipping
    val st = DeltaTable.forPath(spark, dir).statistics
    assert(st.minValues.get("dt").exists(_.asText == "1999-12-31"))
    assert(st.maxValues.get("dt").exists(_.asText == "2021-03-04"))
  }

  test("timestamp_ntz columns persist as protocol timestamp_ntz and round-trip values") {
    val dir = tempTable("edge-ntz").toString
    // testdata timestamps read as TimestampNTZType in Spark 4; since
    // round 11 the primitive persists as itself (feature-fenced)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .filter(col("l_orderkey") < 100)
    assert(li.schema("l_shipdate").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    GraftWriter.write(li, dir)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.schema("l_shipdate").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.readerFeatures.exists(_.contains("timestampNtz")))
    // values agree when both sides are viewed as UTC dates
    val expected = li.select(to_date(col("l_shipdate")).cast("string"))
      .as[String].collect().sorted
    val got = dt.toDF.select(to_date(col("l_shipdate")).cast("string"))
      .as[String].collect().sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("forPathAsOf end-to-end (timestamp time travel)") {
    val dir = tempTable("edge-asof").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    val t0 = log.versionTimestamp(0)
    // second commit strictly later
    Thread.sleep(5)
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    LogFixtures.setCommitTime(java.nio.file.Paths.get(dir), 1, t0 + 60000)
    assert(DeltaTable.forPathAsOf(spark, dir, t0).toDF.count() == 1)
    assert(DeltaTable.forPathAsOf(spark, dir, t0 + 120000).toDF.count() == 2)
  }

  test("Optimize honors partition filters (compacts only the selected partition)") {
    val dir = tempTable("edge-optfilter").toString
    (0 until 3).foreach { i =>
      GraftWriter.write(
        (0 until 10).map(j => ((i * 10 + j).toLong, j % 2)).toDF("id", "p").repartition(1),
        dir, if (i == 0) SaveMode.ErrorIfExists else SaveMode.Append, Seq("p"))
    }
    val before = DeltaTable.forPath(spark, dir)
    val p0Before = before.files.count(_.partitionValues("p") == "0")
    val p1Before = before.files.count(_.partitionValues("p") == "1")
    assert(p0Before == 3 && p1Before == 3)
    val m = Optimize.compact(spark, dir,
      partitionFilters = Seq(PartitionFilter.Eq("p", "0")))
    assert(m.filesRemoved == 3)
    val after = DeltaTable.forPath(spark, dir)
    assert(after.files.count(_.partitionValues("p") == "1") == 3) // untouched
    assert(after.files.count(_.partitionValues("p") == "0") < 3)
    assert(after.toDF.count() == 30)
  }
}
