package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Authoring side of column mapping ([[ColumnMappingDdl]]): upgrade a
  * graft-native table to `mode=name`, then RENAME/DROP columns as pure
  * metadata commits — no data file touched at any scale. */
class ColumnMappingDdlSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def freshTable(name: String): String = {
    val dir = tempTable(name).toString
    GraftWriter.write(
      Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "y")).toDF("id", "v", "p"),
      dir, partitionBy = Seq("p"))
    dir
  }

  test("enableColumnMapping annotates every field, bumps the protocol, and is idempotent") {
    val dir = freshTable("cmddl-enable")
    val dt = DeltaTable.forPath(spark, dir)
    val v = dt.enableColumnMapping()
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.version == v)
    assert(ColumnMapping.mode(snap) == "name")
    // upgrade keeps the current names physical: existing files were
    // written under them
    snap.schema.fields.foreach { f =>
      assert(f.metadata.getString("delta.columnMapping.physicalName") == f.name)
    }
    assert(snap.schema.fields.map(
      _.metadata.getLong("delta.columnMapping.id")).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(TableConfig.of(snap)("delta.columnMapping.maxColumnId") == "3")
    assert(snap.minReaderVersion >= 2 && snap.minWriterVersion >= 5)
    // scans and appends keep working through the mapped path
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 3)
    GraftWriter.write(Seq((4L, "d", "y")).toDF("id", "v", "p"), dir,
      mode = SaveMode.Append)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 4)
    // idempotent: same version back, no extra commit
    assert(DeltaTable.forPath(spark, dir).enableColumnMapping() ==
      DeltaLog.forPath(spark, dir).update().version)
  }

  test("RENAME COLUMN is metadata-only: same bytes, both names across time travel") {
    val dir = freshTable("cmddl-rename")
    DeltaTable.forPath(spark, dir).enableColumnMapping()
    val filesBefore = DeltaLog.forPath(spark, dir).update().files.map(_.path).toSet
    val v = DeltaTable.forPath(spark, dir).renameColumn("v", "value")
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.snapshot.files.map(_.path).toSet == filesBefore, "a data file moved")
    assert(dt.toDF.schema.fieldNames.toSeq == Seq("id", "value", "p"))
    assert(dt.toDF.filter(col("value") === "b").select("id").as[Long].head() == 2L)
    // pre-rename versions still serve the old name from the same bytes
    val old = DeltaTable.forPath(spark, dir, v - 1)
    assert(old.toDF.schema.fieldNames.contains("v"))
    assert(old.toDF.filter(col("v") === "b").select("id").as[Long].head() == 2L)
    // appends after the rename stage under the ORIGINAL physical name
    GraftWriter.write(Seq((9L, "z", "y")).toDF("id", "value", "p"), dir,
      mode = SaveMode.Append)
    val fresh = DeltaTable.forPath(spark, dir)
    val newAdd = fresh.snapshot.files.filterNot(a => filesBefore.contains(a.path))
    assert(newAdd.size == 1)
    val raw = spark.read.parquet(new java.io.File(dir, newAdd.head.path).getAbsolutePath)
    assert(raw.schema.fieldNames.toSet == Set("id", "v"),
      s"at-rest names must stay physical, got ${raw.schema.fieldNames.toSeq}")
    assert(fresh.toDF.filter(col("value") === "z").select("id").as[Long].head() == 9L)
  }

  test("renaming a partition column keeps pruning working") {
    val dir = freshTable("cmddl-renpart")
    DeltaTable.forPath(spark, dir).enableColumnMapping()
    DeltaTable.forPath(spark, dir).renameColumn("p", "part")
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.partitionColumns == Seq("part"))
    spark.conf.set("spark.graft.planRewrites.enabled", "false")
    try {
      val dt = DeltaTable.forPath(spark, dir)
      assert(dt.toDF.filter(col("part") === "y").select("id").as[Long]
        .collect().toSeq == Seq(3L))
      assert(dt.lastFileIndex.exists(_.lastListedFileCount == 1),
        s"partition pruning broke after rename (${dt.lastFileIndex.map(_.lastListedFileCount)})")
    } finally spark.conf.unset("spark.graft.planRewrites.enabled")
    // appends keyed by the new logical partition name land physical
    GraftWriter.write(Seq((7L, "g", "z")).toDF("id", "v", "part"), dir,
      mode = SaveMode.Append)
    val added = DeltaLog.forPath(spark, dir).update().files
      .find(_.partitionValues.get("p").contains("z"))
    assert(added.isDefined, "partitionValues must stay keyed by the physical name")
  }

  test("nested rename rides the same dotted path") {
    val dir = tempTable("cmddl-nest").toString
    GraftWriter.write(
      Seq((1L, 10L)).toDF("id", "score")
        .select(col("id"), struct(col("score")).as("meta")), dir)
    DeltaTable.forPath(spark, dir).enableColumnMapping()
    DeltaTable.forPath(spark, dir).renameColumn("meta.score", "points")
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("points"))
    assert(dt.toDF.select("meta.points").as[Long].head() == 10L)
  }

  test("DROP COLUMN hides the bytes without touching a file") {
    val dir = freshTable("cmddl-drop")
    DeltaTable.forPath(spark, dir).enableColumnMapping()
    val filesBefore = DeltaLog.forPath(spark, dir).update().files.map(_.path).toSet
    DeltaTable.forPath(spark, dir).dropColumn("v")
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.snapshot.files.map(_.path).toSet == filesBefore)
    assert(dt.toDF.schema.fieldNames.toSeq == Seq("id", "p"))
    assert(dt.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // time travel still serves the dropped column
    assert(DeltaTable.forPath(spark, dir, dt.version - 1)
      .toDF.schema.fieldNames.contains("v"))
    // appends post-drop: two-column frames match the narrowed schema
    GraftWriter.write(Seq((8L, "x")).toDF("id", "p"), dir, mode = SaveMode.Append)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 4)
  }

  test("rename/drop guardrails: unmapped, partition drop, duplicates, constraints, unset") {
    val dir = freshTable("cmddl-guard")
    // unmapped: both refuse with the enable hint
    val e1 = intercept[UnsupportedProtocolException] {
      DeltaTable.forPath(spark, dir).renameColumn("v", "w")
    }
    assert(e1.getMessage.contains("columnMapping.mode"))
    intercept[UnsupportedProtocolException] {
      DeltaTable.forPath(spark, dir).dropColumn("v")
    }
    DeltaTable.forPath(spark, dir).enableColumnMapping()
    // partition column cannot drop
    intercept[IllegalArgumentException] {
      DeltaTable.forPath(spark, dir).dropColumn("p")
    }
    // duplicate target name
    intercept[IllegalArgumentException] {
      DeltaTable.forPath(spark, dir).renameColumn("v", "id")
    }
    // a CHECK constraint referencing the column blocks rename AND drop
    DeltaTable.forPath(spark, dir).addCheckConstraint("vshort", "length(v) < 10")
    val e2 = intercept[IllegalArgumentException] {
      DeltaTable.forPath(spark, dir).renameColumn("v", "w")
    }
    assert(e2.getMessage.contains("vshort"))
    intercept[IllegalArgumentException] {
      DeltaTable.forPath(spark, dir).dropColumn("v")
    }
    DeltaTable.forPath(spark, dir).dropCheckConstraint("vshort")
    assert(DeltaTable.forPath(spark, dir).renameColumn("v", "w") > 0)
    // the mapping properties cannot be unset or downgraded
    intercept[UnsupportedProtocolException] {
      DeltaTable.forPath(spark, dir).unsetProperties(Seq("delta.columnMapping.mode"))
    }
    intercept[UnsupportedProtocolException] {
      DeltaTable.forPath(spark, dir)
        .setProperties(Map("delta.columnMapping.mode" -> "none"))
    }
    intercept[UnsupportedProtocolException] {
      DeltaTable.forPath(spark, freshTable("cmddl-noid"))
        .setProperties(Map("delta.columnMapping.mode" -> "id"))
    }
    // other properties still settable on the mapped table
    assert(DeltaTable.forPath(spark, dir)
      .setProperties(Map("delta.checkpointInterval" -> "5")) > 0)
  }

  test("SQL DDL end-to-end: upgrade, RENAME, DROP, ADD COLUMNS through the catalog") {
    val dir = tempTable("cmddl-sql").toString
    spark.sql("DROP TABLE IF EXISTS cmddl_sql_t")
    spark.sql(
      s"""CREATE TABLE cmddl_sql_t (id BIGINT, v STRING, p STRING)
         |USING `graft-delta` PARTITIONED BY (p) LOCATION '$dir'""".stripMargin)
    spark.sql("INSERT INTO cmddl_sql_t VALUES (1, 'a', 'x'), (2, 'b', 'y')")
    spark.sql("ALTER TABLE cmddl_sql_t SET TBLPROPERTIES " +
      "('delta.columnMapping.mode' = 'name')")
    assert(ColumnMapping.mode(DeltaLog.forPath(spark, dir).update()) == "name")
    spark.sql("ALTER TABLE cmddl_sql_t RENAME COLUMN v TO label")
    assert(spark.sql("SELECT label FROM cmddl_sql_t WHERE id = 2")
      .as[String].head() == "b")
    // ADD COLUMNS on the mapped table allocates a col-<uuid> physical name
    spark.sql("ALTER TABLE cmddl_sql_t ADD COLUMNS (extra BIGINT)")
    val snap = DeltaLog.forPath(spark, dir).update()
    val extra = snap.schema("extra")
    assert(extra.metadata.getString("delta.columnMapping.physicalName")
      .startsWith("col-"))
    assert(extra.metadata.getLong("delta.columnMapping.id") == 4L)
    assert(TableConfig.of(snap)("delta.columnMapping.maxColumnId") == "4")
    spark.sql("INSERT INTO cmddl_sql_t (id, label, extra, p) " +
      "VALUES (3, 'c', 42, 'x')")
    assert(spark.sql("SELECT extra FROM cmddl_sql_t WHERE id = 3")
      .as[Long].head() == 42L)
    spark.sql("ALTER TABLE cmddl_sql_t DROP COLUMN label")
    assert(spark.table("cmddl_sql_t").schema.fieldNames.sorted.toSeq ==
      Seq("extra", "id", "p"))
    assert(spark.sql("SELECT id FROM cmddl_sql_t ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    spark.sql("DROP TABLE cmddl_sql_t")
  }

  test("streaming sink stages physical files into a mapped table") {
    val dir = freshTable("cmddl-sink")
    DeltaTable.forPath(spark, dir).enableColumnMapping()
    DeltaTable.forPath(spark, dir).renameColumn("v", "label")
    val filesBefore = DeltaLog.forPath(spark, dir).update().files.map(_.path).toSet
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val q = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    q.addData((100L, "s1", "x"), (101L, "s2", "z"))
    val stream = q.toDF.toDF("id", "label", "p")
      .writeStream.format("graft-delta")
      .option("appId", "cmddl-sink")
      .partitionBy("p")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cmddl-sink-ckpt").toString)
      .start(dir)
    try stream.processAllAvailable() finally stream.stop()
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.count() == 5)
    assert(dt.toDF.filter(col("id") === 100L).select("label")
      .as[String].head() == "s1")
    // streamed files are at-rest physical: original "v" column, "p" dirs
    val newAdds = dt.snapshot.files.filterNot(a => filesBefore.contains(a.path))
    assert(newAdds.nonEmpty)
    newAdds.foreach { a =>
      val raw = spark.read.parquet(new java.io.File(dir, a.path).getAbsolutePath)
      assert(raw.schema.fieldNames.toSet == Set("id", "v"),
        s"${a.path}: ${raw.schema.fieldNames.toSeq}")
    }
    assert(newAdds.exists(_.partitionValues.get("p").contains("z")),
      "partition dirs must stay keyed by the physical name")
  }

  test("RESTORE across a rename reverts the logical schema, files untouched") {
    val dir = freshTable("cmddl-restore")
    DeltaTable.forPath(spark, dir).enableColumnMapping()
    val preRename = DeltaLog.forPath(spark, dir).update().version
    DeltaTable.forPath(spark, dir).renameColumn("v", "label")
    assert(Dml.delete(spark, dir, col("id") === 1L).rowsAffected == 1)
    // restore to the version before the delete (post-rename): data back
    val r1 = DeltaTable.forPath(spark, dir).restoreToVersion(preRename + 1)
    assert(r1.filesRestored >= 1)
    val afterR1 = DeltaTable.forPath(spark, dir)
    assert(afterR1.toDF.count() == 3)
    assert(afterR1.toDF.schema.fieldNames.contains("label"))
    // restore to BEFORE the rename: the old logical name comes back, the
    // same physical bytes serve it
    DeltaTable.forPath(spark, dir).restoreToVersion(preRename)
    val afterR2 = DeltaTable.forPath(spark, dir)
    assert(afterR2.toDF.schema.fieldNames.toSeq == Seq("id", "v", "p"))
    assert(afterR2.toDF.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("SHALLOW CLONE of a mapped table serves and diverges independently") {
    val src = freshTable("cmddl-clone-src")
    DeltaTable.forPath(spark, src).enableColumnMapping()
    DeltaTable.forPath(spark, src).renameColumn("v", "label")
    val tgt = tempTable("cmddl-clone-tgt").toString
    Clone.shallow(spark, src, tgt)
    val ct = DeltaTable.forPath(spark, tgt)
    assert(ColumnMapping.isMapped(ct.snapshot))
    assert(ct.toDF.select("id", "label").as[(Long, String)]
      .collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // clone-side DML does not disturb the source
    assert(Dml.delete(spark, tgt, col("label") === "a").rowsAffected == 1)
    assert(DeltaTable.forPath(spark, tgt).toDF.count() == 2)
    assert(DeltaTable.forPath(spark, src).toDF.count() == 3)
  }

  test("TRUNCATE TABLE serves mapped catalog tables") {
    val dir = tempTable("cmddl-trunc").toString
    spark.sql("DROP TABLE IF EXISTS cmddl_trunc_t")
    spark.sql(s"CREATE TABLE cmddl_trunc_t (id BIGINT, v STRING) " +
      s"USING `graft-delta` LOCATION '$dir'")
    spark.sql("INSERT INTO cmddl_trunc_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE cmddl_trunc_t SET TBLPROPERTIES " +
      "('delta.columnMapping.mode' = 'name')")
    spark.sql("ALTER TABLE cmddl_trunc_t RENAME COLUMN v TO w")
    spark.sql("TRUNCATE TABLE cmddl_trunc_t")
    assert(spark.table("cmddl_trunc_t").count() == 0)
    // time travel to pre-truncate still serves the data
    val pre = DeltaLog.forPath(spark, dir).update().version - 1
    assert(DeltaTable.forPath(spark, dir, pre).toDF.count() == 2)
    spark.sql("DROP TABLE cmddl_trunc_t")
  }

  test("CREATE TABLE with mode=name maps from version 0: col-<uuid> at rest, rename immediately") {
    val dir = tempTable("cmddl-create").toString
    spark.sql("DROP TABLE IF EXISTS cmddl_create_t")
    spark.sql(
      s"""CREATE TABLE cmddl_create_t (id BIGINT, v STRING, p STRING)
         |USING `graft-delta` PARTITIONED BY (p) LOCATION '$dir'
         |TBLPROPERTIES ('delta.columnMapping.mode' = 'name')""".stripMargin)
    val snap0 = DeltaLog.forPath(spark, dir).update()
    assert(ColumnMapping.mode(snap0) == "name")
    snap0.schema.fields.foreach { f =>
      assert(f.metadata.getString("delta.columnMapping.physicalName")
        .startsWith("col-"), f.name)
    }
    assert(TableConfig.of(snap0)("delta.columnMapping.maxColumnId") == "3")
    assert(snap0.minReaderVersion >= 2 && snap0.minWriterVersion >= 5)
    spark.sql("INSERT INTO cmddl_create_t VALUES (1, 'a', 'x'), (2, 'b', 'y')")
    // at rest: col-<uuid> columns and partition dirs from the FIRST file
    val add = DeltaLog.forPath(spark, dir).update().files.head
    assert(add.partitionValues.keys.forall(_.startsWith("col-")),
      add.partitionValues.toString)
    val raw = spark.read.parquet(new java.io.File(dir, add.path).getAbsolutePath)
    assert(raw.schema.fieldNames.forall(_.startsWith("col-")),
      raw.schema.fieldNames.toSeq.toString)
    assert(spark.sql("SELECT v FROM cmddl_create_t WHERE id = 2")
      .as[String].head() == "b")
    // the whole point: renames work from day one
    spark.sql("ALTER TABLE cmddl_create_t RENAME COLUMN v TO w")
    assert(spark.sql("SELECT w FROM cmddl_create_t WHERE id = 1")
      .as[String].head() == "a")
    spark.sql("DROP TABLE cmddl_create_t")
  }

  test("DataFrame create with mode=id stamps footer ids from the first file") {
    val dir = tempTable("cmddl-createid").toString
    GraftWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir,
      configuration = Some(Map("delta.columnMapping.mode" -> "id")))
    val dt = DeltaTable.forPath(spark, dir)
    assert(ColumnMapping.mode(dt.snapshot) == "id")
    assert(dt.toDF.select("id", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b")))
    // raw probe: a wrong-named schema carrying only the field id resolves
    val fid = dt.schema("id").metadata.getLong("delta.columnMapping.id")
    val probe = spark.read
      .schema(StructType(Seq(StructField("zz", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", fid).build()))))
      .parquet(dt.snapshot.files.map(a =>
        new java.io.File(dir, a.path).getAbsolutePath): _*)
    assert(probe.as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("overwriteSchema replace can enable mapping on an unmapped table") {
    val dir = freshTable("cmddl-replace")
    GraftWriter.write(Seq((10L, "r", "z")).toDF("id", "v", "p"), dir,
      mode = SaveMode.Overwrite, partitionBy = Seq("p"),
      overwriteSchema = true,
      configuration = Some(Map("delta.columnMapping.mode" -> "name")))
    val dt = DeltaTable.forPath(spark, dir)
    assert(ColumnMapping.isMapped(dt.snapshot))
    assert(dt.snapshot.minReaderVersion >= 2 && dt.snapshot.minWriterVersion >= 5)
    assert(dt.toDF.select("id", "v", "p").as[(Long, String, String)]
      .collect().toSeq == Seq((10L, "r", "z")))
    // replacement files are at-rest col-<uuid>
    val add = dt.snapshot.files.head
    assert(add.partitionValues.keys.forall(_.startsWith("col-")))
    // pre-replace versions still serve the unmapped shape
    assert(DeltaTable.forPath(spark, dir, dt.version - 1)
      .toDF.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("DML and OPTIMIZE after an upgrade+rename round-trip") {
    val dir = freshTable("cmddl-dml")
    DeltaTable.forPath(spark, dir).enableColumnMapping()
    DeltaTable.forPath(spark, dir).renameColumn("v", "name")
    // CoW DML through the renamed logical name
    assert(Dml.update(spark, dir, col("name") === "a",
      Map("name" -> lit("A"))).rowsAffected == 1)
    assert(Dml.delete(spark, dir, col("name") === "c").rowsAffected == 1)
    // MERGE through the renamed name
    val src = Seq((2L, "B", "x"), (5L, "E", "y")).toDF("id", "name", "p")
    val m = Merge.into(spark, dir, src.as("s"), col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("name" -> col("s.name")))
      .whenNotMatchedInsertAll()
      .execute()
    assert(m.rowsUpdated == 1 && m.rowsInserted == 1)
    val got = DeltaTable.forPath(spark, dir).toDF
      .select("id", "name").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "A"), (2L, "B"), (5L, "E")))
    val o = Optimize.compact(spark, dir, targetFileBytes = Long.MaxValue)
    assert(o.filesAdded >= 1)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 3)
  }
}
