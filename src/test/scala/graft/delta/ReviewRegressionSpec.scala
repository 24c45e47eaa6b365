package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the round-9 self-review of the PRE-session core
  * (Restore/DeltaTable/Snapshot/Clone): each test encodes one found
  * failure scenario. */
class ReviewRegressionSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("RESTORE never rewinds the row-tracking high-water mark") {
    val dir = tempTable("rr-restore-rt").toString
    GraftWriter.write(Seq((0L, "a")).toDF("id", "v"), dir)            // v0
    val pin = DeltaLog.forPath(spark, dir).update().version
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.EnableRowTracking -> "true"))                    // v1
    GraftWriter.write((1 until 50).map(i => (i.toLong, "b")).toDF("id", "v"),
      dir, SaveMode.Append)                                            // v2: ids 0..48
    val markBefore = RowTracking.highWaterMark(DeltaLog.forPath(spark, dir).update())
    assert(markBefore == 48L)
    DeltaTable.forPath(spark, dir).restoreToVersion(pin)               // domain absent at v0
    val after = DeltaLog.forPath(spark, dir).update()
    assert(RowTracking.highWaterMark(after) == markBefore,
      "restore must not rewind/remove the delta.rowTracking mark")
    // and fresh allocations stay beyond it
    GraftWriter.write(Seq((99L, "c")).toDF("id", "v"), dir, SaveMode.Append)
    val s = DeltaLog.forPath(spark, dir).update()
    val newIds = s.files.flatMap(_.baseRowId)
    assert(newIds.forall(_ > markBefore),
      s"fresh ids $newIds collide under mark $markBefore")
  }

  test("RESTORE keeps the furthest identity high-water mark (marks only advance)") {
    val dir = tempTable("rr-restore-id").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      IdentityColumns.field("rid", 1, 1),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    GraftWriter.write(spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema), dir)
    GraftWriter.write(Seq("a", "b").toDF("v"), dir, SaveMode.Append)   // marks ~2
    val pin = DeltaLog.forPath(spark, dir).update().version
    val markAtPin = DeltaTable.forPath(spark, dir).identityColumns.head.highWaterMark.get
    GraftWriter.write((0 until 20).map(i => s"x$i").toDF("v"), dir, SaveMode.Append)
    val markLater = DeltaTable.forPath(spark, dir).identityColumns.head.highWaterMark.get
    assert(markLater > markAtPin)
    DeltaTable.forPath(spark, dir).restoreToVersion(pin)
    val markAfter = DeltaTable.forPath(spark, dir).identityColumns.head.highWaterMark.get
    assert(markAfter == markLater,
      s"restore rewound the identity mark: $markAfter < $markLater")
    GraftWriter.write(Seq("fresh").toDF("v"), dir, SaveMode.Append)
    val ids = DeltaTable.forPath(spark, dir).toDF.select("rid").as[Long].collect()
    assert(ids.distinct.length == ids.length, s"duplicate identity values: ${ids.toSeq}")
  }

  test("vacuum judges liveness against the LATEST version, not a stale handle") {
    val dir = tempTable("rr-vacuum-stale").toString
    // retention floor declared at CREATE so the restore-to-v0 keeps it
    GraftWriter.write((0 until 20).map(i => (i.toLong, "a")).toDF("id", "v")
      .repartition(2), dir, configuration = Some(
        Map(TableConfig.DeletedFileRetention -> "interval 0 hours")))  // v0
    Dml.delete(spark, dir, col("id") < 10)                             // v1 tombstones F
    val stale = DeltaTable.forPath(spark, dir) // handle pinned at v2
    DeltaTable.forPath(spark, dir).restoreToVersion(0)                 // F live again
    Thread.sleep(5) // tombstone ts < cutoff(now)
    stale.vacuum(0.0, dryRun = false, parallelDeleteThreshold = 1000)
    // every row of the restored state must still be readable
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 20,
      "vacuum through a stale handle deleted live files")
  }

  test("unsetProperties refuses tables whose writer features graft does not maintain") {
    val dir = tempTable("rr-unset-fence").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    log.update()
    LogFixtures.writeCommit(java.nio.file.Paths.get(dir), 1,
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["someFutureFeature"]}}"""))
    intercept[UnsupportedProtocolException] {
      DeltaTable.forPath(spark, dir).unsetProperties(Seq("user.x"))
    }
  }

  test("table-level MIN/MAX stays exact past 2^53 and one bad column does not kill the rest") {
    def add(path: String, stats: String) = AddAction(path, 1, Map.empty, 1L,
      dataChange = true, stats = Some(stats))
    val big1 = 9007199254740993L // 2^53 + 1
    val big2 = 9007199254740992L // 2^53
    val st = TableStatistics.of(Seq(
      add("a", s"""{"numRecords":1,"minValues":{"x":$big1,"bad":1},"maxValues":{"x":$big1,"bad":2},"nullCount":{"x":0,"bad":0}}"""),
      add("b", s"""{"numRecords":1,"minValues":{"x":$big2,"bad":"oops"},"maxValues":{"x":$big2,"bad":"oops"},"nullCount":{"x":0,"bad":0}}""")))
    assert(st.minValues.get("x").map(_.asLong).contains(big2),
      s"min must be exact past 2^53, got ${st.minValues.get("x")}")
    assert(st.maxValues.get("x").map(_.asLong).contains(big1))
    // the mixed-type column drops alone; x survives
    assert(!st.minValues.contains("bad"))
  }

  test("compact honors targetFileBytes INSIDE a hive partition (no one-file collapse)") {
    val dir = tempTable("rr-compact-salt").toString
    // one partition tuple, many small files
    GraftWriter.write((0 until 4000).map(i => (i.toLong, "p1", "x" * 100))
      .toDF("id", "part", "pad").repartition(8), dir, partitionBy = Seq("part"))
    val before = DeltaLog.forPath(spark, dir).update().files.size
    assert(before == 8)
    val bytes = DeltaLog.forPath(spark, dir).update().files.map(_.size).sum
    // target ~ quarter of the partition's bytes → expect ~4 outputs, not 1
    val m = Optimize.compact(spark, dir, targetFileBytes = bytes / 4)
    assert(m.filesAdded >= 3,
      s"partition collapsed to ${m.filesAdded} file(s) — salt not applied")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 4000)
  }

  test("UPDATE refuses a GENERATED ALWAYS identity column in ANY case") {
    val dir = tempTable("rr-id-case").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      IdentityColumns.field("id", 1, 1),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    GraftWriter.write(spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema), dir)
    GraftWriter.write(Seq("a").toDF("v"), dir, SaveMode.Append)
    val e = intercept[IllegalArgumentException](
      Dml.update(spark, dir, col("v") === "a", Map("ID" -> lit(99L))))
    assert(e.getMessage.contains("GENERATED ALWAYS"))
  }

  test("insert-only MERGE lands on an append-only table; rewriting merges still refuse") {
    val dir = tempTable("rr-appendonly-merge").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir,
      configuration = Some(Map(TableConfig.AppendOnly -> "true")))
    val m = Merge.into(spark, dir, Seq((2L, "b")).toDF("id", "v"),
        col("t.id") === col("s.id"))
      .whenNotMatchedInsertAll().execute()
    assert(m.rowsInserted == 1)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 2)
    intercept[AppendOnlyTableException] {
      Merge.into(spark, dir, Seq((1L, "z")).toDF("id", "v"),
          col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("v" -> col("s.v"))).execute()
    }
  }

  test("multi-clause MERGE with a partially-assigned generated column succeeds") {
    val dir = tempTable("rr-merge-gen").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.LongType,
        nullable = true,
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .putString(Constraints.GenerationKey, "b + 1").build())))
    GraftWriter.write(spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema), dir)
    GraftWriter.write(Seq((1L, 10L), (2L, 20L)).toDF("id", "b"), dir, SaveMode.Append)
    // clause 1 assigns g explicitly; clause 2 does NOT — the row taken by
    // clause 2 must re-derive g, not abort on a stale value (r9 review)
    Merge.into(spark, dir,
        Seq((1L, 100L, "c1"), (2L, 200L, "c2")).toDF("id", "nb", "tag"),
        col("t.id") === col("s.id"))
      .whenMatchedUpdate(col("s.tag") === "c1",
        Map("b" -> col("s.nb"), "g" -> (col("s.nb") + 1)))
      .whenMatchedUpdate(col("s.tag") === "c2", Map("b" -> col("s.nb")))
      .execute()
    val got = DeltaTable.forPath(spark, dir).toDF
      .select("id", "b", "g").as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 100L, 101L), (2L, 200L, 201L)))
  }

  test("zorder refuses 16+ columns rather than scrambling the curve") {
    val dir = tempTable("rr-zorder-cap").toString
    val base = (0 until 10).map(_.toLong).toDF("c0")
    val wide = (1 until 16).foldLeft(base)((d, i) => d.withColumn(s"c$i", col("c0")))
    GraftWriter.write(wide, dir)
    val e = intercept[IllegalArgumentException](
      Optimize.zorder(spark, dir, (0 until 16).map(i => s"c$i")))
    assert(e.getMessage.contains("15"))
  }

  test("cloning a vacuumed-past pinned version refuses instead of committing a corrupt fork") {
    val dir = tempTable("rr-clone-vacuumed").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, "a")).toDF("id", "v")
      .repartition(1), dir)                                            // v0
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.DeletedFileRetention -> "interval 0 hours"))
    GraftWriter.write((0 until 10).map(i => (i.toLong, "b")).toDF("id", "v")
      .repartition(1), dir, SaveMode.Overwrite)                        // removes v0's file
    Thread.sleep(5)
    DeltaTable.forPath(spark, dir).vacuum(0.0, dryRun = false, 1000)
    val dst = tempTable("rr-clone-dst").toString
    val e = intercept[IllegalStateException](
      Clone.shallow(spark, dir, dst, version = Some(0)))
    assert(e.getMessage.contains("vacuumed"))
  }
}
