package graft.delta

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class VacuumSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures._

  test("retention below the 168h floor is rejected (delta.rs:881-884)") {
    val dir = tempTable("vac-floor").toString
    import spark.implicits._
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val dt = DeltaTable.forPath(spark, dir)
    intercept[IllegalArgumentException] { dt.vacuum(retentionHours = 1) }
    assert(dt.vacuum(retentionHours = 169, dryRun = true).isEmpty)
  }

  test("dry-run lists exactly the expired tombstoned files; vacuum deletes them (read_delta_test.rs:230-265)") {
    val dir = tempTable("vac-del")
    // hand-build: one active file, one tombstone expired long ago
    val dataA = dir.resolve("keep.parquet"); Files.writeString(dataA, "x")
    val dataB = dir.resolve("dead.parquet"); Files.writeString(dataB, "y")
    val oldTs = System.currentTimeMillis() - 400L * 3600 * 1000 // ~16 days ago
    writeCommit(dir, 0, Seq(protocol, metaData, add("keep.parquet"), add("dead.parquet")))
    writeCommit(dir, 1, Seq(remove("dead.parquet", ts = oldTs)))

    val dt = DeltaTable.forPath(spark, dir.toString)
    val dry = dt.vacuum(dryRun = true)
    assert(dry == Seq("dead.parquet"))
    assert(Files.exists(dataB)) // dry run deletes nothing

    val deleted = dt.vacuum()
    assert(deleted == Seq("dead.parquet"))
    assert(!Files.exists(dataB))
    assert(Files.exists(dataA))
  }

  test("parallel delete path removes the same files as the driver loop") {
    val dir = tempTable("vac-parallel")
    val oldTs = System.currentTimeMillis() - 400L * 3600 * 1000
    val dead = (0 until 8).map(i => f"dead-$i%02d.parquet")
    dead.foreach(f => Files.writeString(dir.resolve(f), "x"))
    Files.writeString(dir.resolve("keep.parquet"), "k")
    writeCommit(dir, 0, Seq(protocol, metaData, add("keep.parquet")) ++ dead.map(add(_)))
    writeCommit(dir, 1, dead.map(remove(_, ts = oldTs)))
    val dt = DeltaTable.forPath(spark, dir.toString)
    // force the distributed path with threshold 0
    val deleted = dt.vacuum(retentionHours = 168, dryRun = false, parallelDeleteThreshold = 0)
    assert(deleted == dead)
    assert(dead.forall(f => !Files.exists(dir.resolve(f))))
    assert(Files.exists(dir.resolve("keep.parquet")))
  }

  test("fresh tombstones are retained; hidden files are never candidates (delta.rs:904-916)") {
    val dir = tempTable("vac-keep")
    Files.writeString(dir.resolve("fresh.parquet"), "f")
    Files.createDirectories(dir.resolve(".hidden"))
    Files.writeString(dir.resolve(".hidden").resolve("h.parquet"), "h")
    val recentTs = System.currentTimeMillis() - 3600 * 1000 // 1h ago
    writeCommit(dir, 0, Seq(protocol, metaData, add("other.parquet")))
    writeCommit(dir, 1, Seq(remove("fresh.parquet", ts = recentTs),
      remove(".hidden/h.parquet", ts = 1L)))
    val dt = DeltaTable.forPath(spark, dir.toString)
    assert(dt.vacuum(dryRun = true).isEmpty)
  }

  test("distributed candidate listing equals the driver walk (partitioned layout)") {
    val dir = tempTable("vac-dist-list")
    val oldTs = System.currentTimeMillis() - 400L * 3600 * 1000
    // partitioned layout: live + expired files across hive dirs, a hidden
    // dir that must be pruned, and a root-level expired file
    val dead = Seq("p=1/dead-a.parquet", "p=2/dead-b.parquet", "root-dead.parquet")
    val live = Seq("p=1/keep-a.parquet", "p=2/keep-b.parquet")
    (dead ++ live).foreach { f =>
      Files.createDirectories(dir.resolve(f).getParent)
      Files.writeString(dir.resolve(f), "x")
    }
    Files.createDirectories(dir.resolve(".stage"))
    Files.writeString(dir.resolve(".stage").resolve("tmp.parquet"), "h")
    writeCommit(dir, 0, Seq(protocol, metaData) ++ (dead ++ live).map(add(_)))
    writeCommit(dir, 1, dead.map(remove(_, ts = oldTs)))

    // driver walk first (threshold default is far above this table)
    val w0 = DeltaTable.driverVacuumWalks.get()
    val viaDriver = DeltaTable.forPath(spark, dir.toString).vacuum(dryRun = true)
    assert(DeltaTable.driverVacuumWalks.get() == w0 + 1)

    // distributed walk: threshold 0 forces the executor fan-out
    spark.conf.set(DeltaTable.DistributedVacuumListKey, "0")
    try {
      val w1 = DeltaTable.driverVacuumWalks.get()
      val viaDist = DeltaTable.forPath(spark, dir.toString).vacuum(dryRun = true)
      assert(DeltaTable.driverVacuumWalks.get() == w1,
        "threshold 0 must route the walk to executors")
      assert(viaDist == viaDriver && viaDist == dead.sorted)
      // and the distributed-listed vacuum actually deletes the same set
      val deleted = DeltaTable.forPath(spark, dir.toString).vacuum()
      assert(deleted == dead.sorted)
      assert(dead.forall(f => !Files.exists(dir.resolve(f))))
      assert(live.forall(f => Files.exists(dir.resolve(f))))
      assert(Files.exists(dir.resolve(".stage").resolve("tmp.parquet")))
    } finally spark.conf.unset(DeltaTable.DistributedVacuumListKey)
  }
}

class PartitionFilterSpec extends AnyFunSuite {
  private def addWith(pv: (String, String)*): AddAction =
    AddAction(pv.map { case (k, v) => s"$k=$v" }.mkString("/") + "/f.parquet",
      1, pv.toMap, 0, dataChange = true)

  // the delta-0.8.0-partitioned fixture's partition space (read_delta_test.rs:148-228)
  private val files = Seq(
    addWith("year" -> "2020", "month" -> "1", "day" -> "1"),
    addWith("year" -> "2020", "month" -> "2", "day" -> "3"),
    addWith("year" -> "2020", "month" -> "2", "day" -> "5"),
    addWith("year" -> "2021", "month" -> "4", "day" -> "5"),
    addWith("year" -> "2021", "month" -> "12", "day" -> "4"),
    addWith("year" -> "2021", "month" -> "12", "day" -> "20"))

  import PartitionFilter._

  test("equality filter") {
    assert(prune(files, Seq(Eq("year", "2020"))).size == 3)
    assert(prune(files, Seq(Eq("year", "2020"), Eq("month", "2"))).size == 2)
  }
  test("inequality filter") {
    assert(prune(files, Seq(Ne("year", "2020"))).size == 3)
    assert(prune(files, Seq(Ne("day", "5"))).size == 4)
  }
  test("in / not-in filters (string-valued, like the reference)") {
    assert(prune(files, Seq(In("month", Set("1", "12")))).size == 3)
    assert(prune(files, Seq(NotIn("month", Set("1", "12")))).size == 3)
    assert(prune(files, Seq(In("year", Set("2021")), NotIn("day", Set("4")))).size == 2)
  }
  test("filter on absent key matches nothing") {
    assert(prune(files, Seq(Eq("nope", "1"))).isEmpty)
  }
  test("invalid op raises (partitions.rs:55-98)") {
    intercept[IllegalArgumentException] { PartitionFilter.from("k", ">", "1") }
    intercept[IllegalArgumentException] { PartitionFilter.from("k", "between", Seq("1")) }
  }
  test("parse from tuples") {
    assert(PartitionFilter.from("k", "=", "v") == Eq("k", "v"))
    assert(PartitionFilter.from("k", "!=", "v") == Ne("k", "v"))
    assert(PartitionFilter.from("k", "in", Seq("a", "b")) == In("k", Set("a", "b")))
    assert(PartitionFilter.from("k", "not in", Seq("a")) == NotIn("k", Set("a")))
  }
}

class DeltaSchemaSpec extends AnyFunSuite {
  import org.apache.spark.sql.types._

  test("schemaString round-trip: primitives, array, map, struct, decimal") {
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("l", LongType),
      StructField("i", IntegerType), StructField("d", DoubleType),
      StructField("b", BooleanType), StructField("dt", DateType),
      StructField("ts", TimestampType), StructField("dec", DecimalType(20, 2)),
      StructField("arr", ArrayType(LongType, containsNull = true)),
      StructField("map", MapType(StringType, StringType, valueContainsNull = true)),
      StructField("nested", StructType(Seq(StructField("x", StringType))))))
    val rt = DeltaSchema.fromJson(DeltaSchema.toJson(schema))
    assert(rt == schema)
  }

  test("parses the reference wire-format schemaString (delta type names)") {
    val json = """{"type":"struct","fields":[
      {"name":"value","type":"integer","nullable":true,"metadata":{}},
      {"name":"arr","type":{"type":"array","elementType":"long","containsNull":true},"nullable":true,"metadata":{}},
      {"name":"m","type":{"type":"map","keyType":"string","valueType":"string","valueContainsNull":true},"nullable":true,"metadata":{}}]}"""
    val s = DeltaSchema.fromJson(json)
    assert(s("value").dataType == IntegerType)
    assert(s("arr").dataType == ArrayType(LongType, containsNull = true))
    assert(s("m").dataType == MapType(StringType, StringType, valueContainsNull = true))
  }

  test("non-struct or unsupported types are rejected") {
    intercept[IllegalArgumentException] { DeltaSchema.fromJson(""""long"""") }
    intercept[IllegalArgumentException] {
      DeltaSchema.validate(CalendarIntervalType)
    }
  }
}
