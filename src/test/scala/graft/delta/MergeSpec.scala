package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("upsert: update matched, insert unmatched") {
    val dir = tempTable("merge-upsert").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), dir)
    val src = Seq((5L, 500.0), (6L, 600.0), (20L, 20.0)).toDF("id", "v")

    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("v" -> col("s.v")))
      .whenNotMatchedInsertAll()
      .execute()
    assert(m.rowsUpdated == 2 && m.rowsInserted == 1 && m.rowsDeleted == 0)

    val rows = DeltaTable.forPath(spark, dir).toDF
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(rows.size == 11)
    assert(rows.find(_._1 == 5L).get._2 == 500.0)
    assert(rows.find(_._1 == 6L).get._2 == 600.0)
    assert(rows.find(_._1 == 20L).get._2 == 20.0)
    assert(rows.find(_._1 == 3L).get._2 == 3.0) // untouched
  }

  test("matched delete clause drops rows; earlier update clause wins its rows") {
    val dir = tempTable("merge-del").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), dir)
    val src = (0 until 10).map(i => (i.toLong, 0.0)).toDF("id", "v")

    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .whenMatchedUpdate(col("t.id") < 3, Map("v" -> lit(-1.0)))
      .whenMatchedDelete(col("t.id") >= 7)
      .execute()
    assert(m.rowsUpdated == 3 && m.rowsDeleted == 3 && m.rowsInserted == 0)

    val rows = DeltaTable.forPath(spark, dir).toDF
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(rows.map(_._1) == (0L until 7L))
    assert(rows.take(3).forall(_._2 == -1.0))
    assert(rows.drop(3).forall { case (id, v) => v == id.toDouble })
  }

  test("insert-only merge rewrites no files and does not duplicate matches") {
    val dir = tempTable("merge-insonly").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, s"n$i")).toDF("id", "v")
      .repartition(1), dir)
    val before = DeltaTable.forPath(spark, dir).files.map(_.path).toSet
    val src = Seq((5L, "dup"), (100L, "new")).toDF("id", "v")

    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .whenNotMatchedInsertAll()
      .execute()
    assert(m.filesRewritten == 0 && m.rowsInserted == 1)

    val dt = DeltaTable.forPath(spark, dir)
    assert(before.subsetOf(dt.files.map(_.path).toSet)) // originals untouched
    assert(dt.toDF.count() == 11)
    assert(dt.toDF.filter(col("id") === 5L).count() == 1) // not duplicated
    assert(dt.toDF.filter(col("id") === 100L).select("v").as[String].head() == "new")
  }

  test("a target row matching two source rows raises MultipleMatchException") {
    val dir = tempTable("merge-dup").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val src = Seq((1L, "x"), (1L, "y")).toDF("id", "v")
    intercept[MultipleMatchException] {
      Merge.into(spark, dir, src, col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("v" -> col("s.v"))).execute()
    }
    // table unchanged, no commit
    assert(DeltaTable.forPath(spark, dir).version == 0)
  }

  test("no-op merge (nothing matched, nothing to insert) commits nothing") {
    val dir = tempTable("merge-noop").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val src = Seq((1L, "x")).toDF("id", "v") // matches, but insert-only merge
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .whenNotMatchedInsertAll().execute()
    assert(m.rowsInserted == 0 && m.version == 0)
    assert(DeltaTable.forPath(spark, dir).version == 0)
  }

  test("multiple clauses of the same kind: first-matching-clause-wins order") {
    val dir = tempTable("merge-multi").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), dir)
    val src = (0 until 12).map(i => (i.toLong, 0.0)).toDF("id", "v")
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .whenMatchedUpdate(col("t.id") < 2, Map("v" -> lit(-1.0)))
      .whenMatchedUpdate(col("t.id") < 5, Map("v" -> lit(-2.0))) // ids 2-4 only
      .whenMatchedDelete(col("t.id") >= 8)
      .whenNotMatchedInsert(col("s.id") === 10L, Map("id" -> col("s.id"), "v" -> lit(10.0)))
      .whenNotMatchedInsertAll() // catches id=11 only (10 claimed above)
      .execute()
    assert(m.rowsUpdated == 5 && m.rowsDeleted == 2 && m.rowsInserted == 2)
    val rows = DeltaTable.forPath(spark, dir).toDF
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(rows.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 10L, 11L))
    assert(rows.take(2).forall(_._2 == -1.0))       // first update clause
    assert(rows.slice(2, 5).forall(_._2 == -2.0))   // second update clause
    assert(rows.slice(5, 8).forall { case (id, v) => v == id.toDouble }) // untouched
    assert(rows.find(_._1 == 10L).get._2 == 10.0)   // first insert clause
    assert(rows.find(_._1 == 11L).get._2 == 0.0)    // insertAll fallback
  }

  test("WHEN NOT MATCHED BY SOURCE deletes/updates unmatched target rows") {
    val dir = tempTable("merge-bysource").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), dir)
    val src = Seq((3L, 300.0), (4L, 400.0)).toDF("id", "v")
    // sync semantics: matched rows refresh, unmatched old rows (<2) drop,
    // other unmatched rows get flagged with v = -9
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("v" -> col("s.v")))
      .whenNotMatchedBySourceDelete(col("t.id") < 2)
      .whenNotMatchedBySourceUpdate(col("t.id") >= 8, Map("v" -> lit(-9.0)))
      .execute()
    assert(m.rowsUpdated == 4 && m.rowsDeleted == 2) // 2 matched + 2 flagged; 0,1 dropped
    val rows = DeltaTable.forPath(spark, dir).toDF
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(rows.map(_._1) == Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    assert(rows.find(_._1 == 3L).get._2 == 300.0)
    assert(rows.find(_._1 == 8L).get._2 == -9.0)
    assert(rows.find(_._1 == 5L).get._2 == 5.0) // untouched middle
  }

  test("by-source merge with no applicable rows commits nothing") {
    val dir = tempTable("merge-bysource-noop").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val src = Seq((1L, "x")).toDF("id", "v") // everything matches
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .whenNotMatchedBySourceDelete()
      .execute()
    assert(m.rowsDeleted == 0 && m.version == 0)
    assert(DeltaTable.forPath(spark, dir).version == 0)
  }

  test("partitioned upsert keeps the hive layout") {
    val dir = tempTable("merge-part").toString
    GraftWriter.write((0 until 40).map(i => (i.toLong, i % 2)).toDF("id", "p"),
      dir, SaveMode.ErrorIfExists, Seq("p"))
    val src = Seq((3L, 9), (100L, 9)).toDF("id", "p") // move 3 to p=9, insert 100
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("p" -> col("s.p")))
      .whenNotMatchedInsertAll()
      .execute()
    assert(m.rowsUpdated == 1 && m.rowsInserted == 1)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.count() == 41)
    assert(dt.files.forall(_.partitionValues.keySet == Set("p")))
    assert(dt.toDF.filter(col("p") === 9).select("id").as[Long].collect().toSet
      == Set(3L, 100L))
  }

  test("withSchemaEvolution appends source-only columns; old rows serve null") {
    val dir = tempTable("merge-evolve").toString
    GraftWriter.write((0 until 6).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), dir)
    val src = Seq((2L, 200.0, "m2"), (9L, 9.0, "m9")).toDF("id", "v", "extra")

    // without evolution, assigning the new column refuses (unchanged)
    intercept[IllegalArgumentException] {
      Merge.into(spark, dir, src, col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("extra" -> col("s.extra"))).execute()
    }

    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .withSchemaEvolution()
      .whenMatchedUpdate(Map("v" -> col("s.v"), "extra" -> col("s.extra")))
      .whenNotMatchedInsertAll()
      .execute()
    assert(m.rowsUpdated == 1 && m.rowsInserted == 1)

    val s = DeltaLog.forPath(spark, dir).update()
    assert(s.schema.fieldNames.contains("extra"))
    assert(s.schema("extra").nullable)
    val rows = DeltaTable.forPath(spark, dir).toDF.orderBy("id")
      .select("id", "v", "extra").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSeq
    assert(rows.size == 7)
    assert(rows.find(_._1 == 2L).get == ((2L, 200.0, Some("m2"))))
    assert(rows.find(_._1 == 9L).get == ((9L, 9.0, Some("m9"))))
    assert(rows.find(_._1 == 3L).get == ((3L, 3.0, None)), "old rows null-fill")
  }

  test("withSchemaEvolution refuses a shared-column type conflict") {
    val dir = tempTable("merge-evolve-conflict").toString
    GraftWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    val src = Seq((1L, "not-a-double")).toDF("id", "v")
    intercept[SchemaMismatchException] {
      Merge.into(spark, dir, src, col("t.id") === col("s.id"))
        .withSchemaEvolution()
        .whenMatchedUpdate(Map("v" -> col("s.v"))).execute()
    }
  }

  test("withSchemaEvolution on a column-mapped table allocates physical names") {
    val dir = tempTable("merge-evolve-mapped").toString
    GraftWriter.write((0 until 4).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir)
    ColumnMappingDdl.enableNameMapping(spark, dir)
    val src = Seq((1L, "upd", 77L), (50L, "new", 99L)).toDF("id", "v", "score")
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .withSchemaEvolution()
      .whenMatchedUpdate(Map("v" -> col("s.v"), "score" -> col("s.score")))
      .whenNotMatchedInsertAll()
      .execute()
    assert(m.rowsUpdated == 1 && m.rowsInserted == 1)
    val s = DeltaLog.forPath(spark, dir).update()
    val f = s.schema("score")
    assert(ColumnMapping.physicalFieldName(f) != "score",
      "evolved column on a mapped table needs a fresh physical name")
    val got = DeltaTable.forPath(spark, dir).toDF.orderBy("id")
      .select("id", "score").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got == Seq((0L, -1L), (1L, 77L), (2L, -1L), (3L, -1L), (50L, 99L)))
  }

  test("withSchemaEvolution + CDF: change images serve the evolved schema") {
    val dir = tempTable("merge-evolve-cdf").toString
    GraftWriter.write((0 until 4).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), dir,
      configuration = Some(Map(TableConfig.EnableChangeDataFeed -> "true")))
    val src = Seq((1L, 100.0, "x")).toDF("id", "v", "tag")
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .withSchemaEvolution()
      .whenMatchedUpdate(Map("v" -> col("s.v"), "tag" -> col("s.tag")))
      .execute()
    assert(m.rowsUpdated == 1)
    val ch = DeltaTable.forPath(spark, dir)
      .changes(m.version - 1, m.version)
      .filter(col("_change_type").isin("update_preimage", "update_postimage"))
      .select("id", "tag", "_change_type").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(ch == Set((1L, None, "update_preimage"), (1L, Some("x"), "update_postimage")))
  }

  test("withSchemaEvolution + CDF + column mapping together stage evolved change files") {
    val dir = tempTable("merge-evolve-cdf-mapped").toString
    GraftWriter.write((0 until 4).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), dir,
      configuration = Some(Map(TableConfig.EnableChangeDataFeed -> "true")))
    ColumnMappingDdl.enableNameMapping(spark, dir)
    val src = Seq((1L, 100.0, "x"), (50L, 50.0, "y")).toDF("id", "v", "tag")
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .withSchemaEvolution()
      .whenMatchedUpdate(Map("v" -> col("s.v"), "tag" -> col("s.tag")))
      .whenNotMatchedInsertAll()
      .execute()
    assert(m.rowsUpdated == 1 && m.rowsInserted == 1)
    val ch = DeltaTable.forPath(spark, dir).changes(m.version - 1, m.version)
      .select("id", "tag", "_change_type").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(ch == Set(
      (1L, None, "update_preimage"), (1L, Some("x"), "update_postimage"),
      (50L, Some("y"), "insert")))
    assert(DeltaTable.forPath(spark, dir).toDF
      .filter(col("tag").isNotNull).count() == 2)
  }

  test("insert-only merge on a row-tracking table: fresh ids, NO materialized-column minting") {
    val dir = tempTable("merge-rt-insert-only").toString
    GraftWriter.write((0 until 3).map(i => (i.toLong, "a")).toDF("id", "v"), dir,
      configuration = Some(Map(TableConfig.EnableRowTracking -> "true")))
    val m = Merge.into(spark, dir, Seq((9L, "n")).toDF("id", "v"),
        col("t.id") === col("s.id"))
      .whenNotMatchedInsertAll().execute()
    assert(m.rowsInserted == 1)
    // no rewrite happened: the commit must not mint materialized names
    // (a needless metaData action that conflicts every concurrent commit)
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
        dir, "_delta_log", f"${m.version}%020d.json"))).asScala
    assert(!lines.exists(_.contains("\"metaData\"")),
      "insert-only merge must not commit a metaData action")
    val s = DeltaLog.forPath(spark, dir).update()
    assert(RowTracking.materializedCols(s).isEmpty)
    // but the inserted file still carries a fresh base id beyond the mark
    val ids = DeltaTable.forPath(spark, dir).withRowIds
      .select("_row_id").as[Long].collect()
    assert(ids.distinct.length == 4, s"row ids not unique: ${ids.toSeq}")
  }

  test("withSchemaEvolution + row tracking: one metaData action, ids preserved") {
    val dir = tempTable("merge-evolve-rt").toString
    GraftWriter.write((0 until 5).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), dir,
      configuration = Some(Map(TableConfig.EnableRowTracking -> "true")))
    def ids() = DeltaTable.forPath(spark, dir).withRowIds
      .select(col("id"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = ids()
    val src = Seq((1L, 100.0, "x"), (50L, 50.0, "y")).toDF("id", "v", "tag")
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .withSchemaEvolution()
      .whenMatchedUpdate(Map("v" -> col("s.v"), "tag" -> col("s.tag")))
      .whenNotMatchedInsertAll()
      .execute()
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
        dir, "_delta_log", f"${m.version}%020d.json"))).asScala
    assert(lines.count(_.contains("\"metaData\"")) == 1,
      "evolution + first materialization must fold into ONE metaData action")
    val after = ids()
    before.keySet.foreach(k => assert(after(k) == before(k), s"row $k id changed"))
    assert(DeltaLog.forPath(spark, dir).update().schema.fieldNames.contains("tag"))
  }

  test("r15: withTargetScanPredicates skips the detection scan on pruned files, same results") {
    val dir = tempTable("merge-prune").toString
    // 4 files with disjoint id ranges
    (0 until 4).foreach { k =>
      GraftWriter.write(
        (k * 1000 until k * 1000 + 50).map(i => (i.toLong, i * 1.0))
          .toDF("id", "v").repartition(1),
        dir, if (k == 0) SaveMode.ErrorIfExists else SaveMode.Append)
    }
    val src = Seq((2005L, -1.0), (2006L, -2.0), (9999L, -3.0)).toDF("id", "v")
    val before = DeltaLog.forPath(spark, dir).update().files.map(_.path).toSet
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .withTargetScanPredicates(Seq(
        StatsPredicate.inLongSet("id", Array(2005L, 2006L, 9999L))))
      .whenMatchedUpdate(Map("v" -> col("s.v")))
      .whenNotMatchedInsertAll()
      .execute()
    assert(m.rowsUpdated == 2 && m.rowsInserted == 1)
    // only file 2 was rewritten; the other three survived untouched
    val paths = DeltaLog.forPath(spark, dir).update().files.map(_.path).toSet
    assert((before & paths).size == 3,
      s"exactly the 3 unpruned-and-unmatched files must survive untouched")
    val rows = DeltaTable.forPath(spark, dir).toDF.orderBy("id")
      .as[(Long, Double)].collect()
    assert(rows.length == 201)
    assert(rows.find(_._1 == 2005L).get._2 == -1.0)
    assert(rows.find(_._1 == 9999L).get._2 == -3.0)
    assert(rows.find(_._1 == 5L).get._2 == 5.0)
    // by-source clauses cannot compose — any file may hold unmatched rows
    intercept[IllegalArgumentException] {
      Merge.into(spark, dir, src, col("t.id") === col("s.id"))
        .withTargetScanPredicates(Seq(
          StatsPredicate.inLongSet("id", Array(1L))))
        .whenNotMatchedBySourceDelete()
        .execute()
    }
  }

  test("r16: requireAppVersion aborts a stale destructive merge BEFORE it deletes") {
    val dir = tempTable("merge-appver").toString
    val app = "graft.test.mark"
    GraftWriter.write((0 until 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"),
      dir, extraActions = Seq(TxnAction(app, 5L)))
    val src = (0 until 10).map(i => (i.toLong, 0.0)).toDF("id", "v")
    // stale expectation (a twin already advanced the mark past 4): the
    // eager first leg throws before any join or rewrite work, and the
    // target keeps every row
    intercept[StaleAppVersionException] {
      Merge.into(spark, dir, src, col("t.id") === col("s.id"))
        .requireAppVersion(app, 4L)
        .whenMatchedDelete()
        .execute()
    }
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 10,
      "a stale merge must not delete anything")
    // matching expectation: the merge applies and RE-ASSERTS the mark at
    // the same value (arming the conflict rule, not advancing progress)
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .requireAppVersion(app, 5L)
      .whenMatchedDelete(col("t.id") >= 8)
      .execute()
    assert(m.rowsDeleted == 2)
    assert(DeltaLog.forPath(spark, dir).update()
      .appTransactionVersion.get(app).contains(5L),
      "the precondition re-asserts, never advances, the mark")
    // at most one precondition per merge
    intercept[IllegalArgumentException] {
      Merge.into(spark, dir, src, col("t.id") === col("s.id"))
        .requireAppVersion(app, 5L).requireAppVersion(app, 6L)
    }
  }
}
