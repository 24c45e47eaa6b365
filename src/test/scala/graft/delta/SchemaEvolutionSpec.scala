package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SchemaEvolutionSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("mergeSchema append adds columns; old rows null-fill on read") {
    val dir = tempTable("evolve").toString
    GraftWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val v = GraftWriter.write(Seq((3L, "c", 30.0)).toDF("id", "v", "score"),
      dir, SaveMode.Append, mergeSchema = true)
    assert(v == 1)

    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(dt.schema("score").nullable)
    val rows = dt.toDF.orderBy("id")
      .select(col("id"), col("score")).as[(Long, Option[Double])].collect().toSeq
    assert(rows == Seq((1L, None), (2L, None), (3L, Some(30.0))))
  }

  test("append with new columns and no mergeSchema is rejected") {
    val dir = tempTable("evolve-strict").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    intercept[SchemaMismatchException] {
      GraftWriter.write(Seq((2L, "b", 1.0)).toDF("id", "v", "x"),
        dir, SaveMode.Append)
    }
    assert(DeltaLog.forPath(spark, dir).update().version == 0)
  }

  test("mergeSchema type conflict on a shared column is rejected") {
    val dir = tempTable("evolve-conflict").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val e = intercept[SchemaMismatchException] {
      GraftWriter.write(Seq((2L, 99)).toDF("id", "v"), // v: int vs string
        dir, SaveMode.Append, mergeSchema = true)
    }
    assert(e.getMessage.contains("type conflicts"))
  }

  test("time travel to a pre-evolution version shows the old schema") {
    val dir = tempTable("evolve-tt").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    GraftWriter.write(Seq((2L, "b", 1.5)).toDF("id", "v", "score"),
      dir, SaveMode.Append, mergeSchema = true)
    assert(DeltaTable.forPath(spark, dir, 0).schema.fieldNames.toSeq == Seq("id", "v"))
    assert(DeltaTable.forPath(spark, dir).schema.fieldNames.toSeq == Seq("id", "v", "score"))
  }

  test("format writer honors the mergeSchema option") {
    val dir = tempTable("evolve-fmt").toString
    Seq((1L, "a")).toDF("id", "v").write.format("graft-delta").save(dir)
    Seq((2L, "b", 7L)).toDF("id", "v", "n").write.format("graft-delta")
      .mode("append").option("mergeSchema", "true").save(dir)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.schema.fieldNames.toSeq == Seq("id", "v", "n"))
    assert(dt.toDF.count() == 2)
  }

  test("overwrite with mergeSchema keeps prior columns in the schema") {
    val dir = tempTable("evolve-ow").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    GraftWriter.write(Seq((9L, 1.0)).toDF("id", "w"),
      dir, SaveMode.Overwrite, mergeSchema = true)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.schema.fieldNames.toSeq == Seq("id", "v", "w"))
    val row = dt.toDF.select("id", "v", "w").as[(Long, Option[String], Option[Double])].head()
    assert(row == ((9L, None, Some(1.0))))
  }

  test("overwriteSchema replaces schema and partitioning on overwrite") {
    val dir = tempTable("evolve-ows").toString
    GraftWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val v = GraftWriter.write(
      Seq(("x", 1.5, "p1"), ("y", 2.5, "p2")).toDF("name", "score", "p"),
      dir, SaveMode.Overwrite, partitionBy = Seq("p"), overwriteSchema = true)
    assert(v == 1)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.schema.fieldNames.toSeq == Seq("name", "score", "p"))
    assert(dt.partitionColumns == Seq("p"))
    assert(dt.toDF.orderBy("name").as[(String, Double, String)].collect().toSeq ==
      Seq(("x", 1.5, "p1"), ("y", 2.5, "p2")))
    // history: the old schema is still readable at version 0
    assert(DeltaTable.forPath(spark, dir, 0).schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("overwriteSchema outside Overwrite mode is rejected") {
    val dir = tempTable("evolve-ows-mode").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    intercept[SchemaMismatchException] {
      GraftWriter.write(Seq(("x", 1.0)).toDF("name", "score"),
        dir, SaveMode.Append, overwriteSchema = true)
    }
    intercept[SchemaMismatchException] {
      GraftWriter.write(Seq(("x", 1.0)).toDF("name", "score"),
        dir, SaveMode.Overwrite, mergeSchema = true, overwriteSchema = true)
    }
    assert(DeltaLog.forPath(spark, dir).update().version == 0)
  }

  test("format writer honors the overwriteSchema option") {
    val dir = tempTable("evolve-ows-fmt").toString
    Seq((1L, "a")).toDF("id", "v").write.format("graft-delta").save(dir)
    Seq(("z", 9L)).toDF("name", "n").write.format("graft-delta")
      .mode("overwrite").option("overwriteSchema", "true").save(dir)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.schema.fieldNames.toSeq == Seq("name", "n"))
    assert(dt.toDF.as[(String, Long)].collect().toSeq == Seq(("z", 9L)))
  }

  test("overwriteSchema does not resurrect dropped generated columns (r12)") {
    // old table has a generated column derived from `id`; the replacement
    // drops BOTH — the old code re-computed `twice` from the old snapshot
    // and folded it into the replacing schema (or crashed on the missing
    // source column)
    import org.apache.spark.sql.types._
    val dir = tempTable("evolve-ows-gen").toString
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("twice", LongType, nullable = true, metadata =
        new MetadataBuilder()
          .putString("delta.generationExpression", "id * 2").build())))
    val rows = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, 2L)), schema)
    GraftWriter.write(rows, dir)
    GraftWriter.write(Seq(("x", 1.0)).toDF("name", "score"),
      dir, SaveMode.Overwrite, overwriteSchema = true)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.schema.fieldNames.toSeq == Seq("name", "score"),
      "replaced schema must be exactly the incoming frame's")
    assert(dt.toDF.as[(String, Double)].collect().toSeq == Seq(("x", 1.0)))
  }

  test("overwriteSchema does not enforce the outgoing table's constraints (r12)") {
    val dir = tempTable("evolve-ows-check").toString
    GraftWriter.write(Seq((1L, 5L)).toDF("id", "qty"), dir)
    DeltaTable.forPath(spark, dir).addCheckConstraint("qty_pos", "qty > 0")
    // replacement drops `qty` entirely; the old CHECK would fail analysis
    GraftWriter.write(Seq(("a", -9.0)).toDF("name", "score"),
      dir, SaveMode.Overwrite, overwriteSchema = true,
      configuration = Some(Map.empty))
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.schema.fieldNames.toSeq == Seq("name", "score"))
    assert(!TableConfig.of(DeltaLog.forPath(spark, dir).update())
      .keys.exists(_.startsWith("delta.constraints.")),
      "replaced (empty) configuration must drop the CHECK constraint")
  }

  test("overwriteSchema enforces constraints carried forward into the replacement (r12)") {
    // configuration=None carries the old config — including its CHECK —
    // into the replaced table; the replacing data must validate against
    // what the table will DECLARE, not skip enforcement entirely
    val dir = tempTable("evolve-ows-keepcheck").toString
    GraftWriter.write(Seq((1L, 5L)).toDF("id", "qty"), dir)
    DeltaTable.forPath(spark, dir).addCheckConstraint("qty_pos", "qty > 0")
    val before = DeltaLog.forPath(spark, dir).update().version
    intercept[Exception] { // violating replace (repartitioning use-case)
      GraftWriter.write(Seq((9L, -5L)).toDF("id", "qty"),
        dir, SaveMode.Overwrite, partitionBy = Seq("id"), overwriteSchema = true)
    }
    assert(DeltaLog.forPath(spark, dir).update().version == before,
      "violating replace must not commit")
    // clean replace passes, and the constraint survives into the new table
    GraftWriter.write(Seq((9L, 7L)).toDF("id", "qty"),
      dir, SaveMode.Overwrite, partitionBy = Seq("id"), overwriteSchema = true)
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(TableConfig.of(snap).get("delta.constraints.qty_pos").contains("qty > 0"))
    intercept[Exception] { // and keeps enforcing on the next append
      GraftWriter.write(Seq((10L, -1L)).toDF("id", "qty"), dir, SaveMode.Append)
    }
  }

  test("overwriteSchema with a flavor-only schema keeps and stages the at-rest flavor (r12)") {
    // replace whose schema differs from the table's ONLY in timestamp
    // flavor: the normalize-equal compare keeps the OLD schemaString, so
    // the staged parquet must carry the OLD flavor's annotation too
    val dir = tempTable("evolve-ows-flavor").toString
    val tz = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))
      .toDF("id", "ts")
    GraftWriter.write(tz, dir)
    val ntz = tz.select(col("id"), col("ts").cast("timestamp_ntz").as("ts"))
    val v = GraftWriter.write(ntz, dir, SaveMode.Overwrite, overwriteSchema = true)
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(DeltaSchema.fromJson(snap.metadata.get.schemaString)("ts").dataType ==
      org.apache.spark.sql.types.TimestampType, "old schemaString kept")
    val newFiles = DeltaLog.forPath(spark, dir).readCommit(v)
      .collect { case a: AddAction => s"$dir/${ActionPath.decode(a.path)}" }
    assert(newFiles.nonEmpty)
    assert(spark.read.parquet(newFiles: _*).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      "staged file must carry the UTC-adjusted annotation the kept schema declares")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)
  }

  test("CREATE validates against its own declared constraints (r12)") {
    // the 'validate against what the commit leaves behind' principle must
    // hold at CREATE too: a table born declaring CHECK qty_pos must not
    // be born containing a violation
    val dir = tempTable("create-check").toString
    intercept[Exception] {
      GraftWriter.write(Seq((1L, -5L)).toDF("id", "qty"), dir,
        configuration = Some(Map("delta.constraints.qty_pos" -> "qty > 0")))
    }
    assert(DeltaLog.forPath(spark, dir).update().version < 0,
      "violating create must not commit")
    GraftWriter.write(Seq((1L, 5L)).toDF("id", "qty"), dir,
      configuration = Some(Map("delta.constraints.qty_pos" -> "qty > 0")))
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)
  }

  test("kept-schema replace advances identity marks from the kept metadata (r12)") {
    import org.apache.spark.sql.types._
    // the incoming frame has NO identity metadata; the normalize-equal
    // compare keeps the OLD schemaString (identity metadata included) —
    // the mark harvest must follow the COMMITTED schema, not the frame's
    val dir = tempTable("evolve-ows-keptid").toString
    val schema = StructType(Seq(
      IdentityColumns.field("rid", 1L, 1L, allowExplicitInsert = true),
      StructField("v", StringType)))
    GraftWriter.write(spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(100L, "a")), schema), dir)
    // plain frame, same (name, type) shape → schemaString kept
    GraftWriter.write(Seq((500L, "b")).toDF("rid", "v"),
      dir, SaveMode.Overwrite, overwriteSchema = true)
    val info = DeltaTable.forPath(spark, dir).identityColumns.head
    assert(info.highWaterMark.contains(500L),
      s"kept-schema replace must record the explicit mark, got ${info.highWaterMark}")
    GraftWriter.write(Seq("c").toDF("v"), dir, SaveMode.Append)
    val got = DeltaTable.forPath(spark, dir).toDF
      .select("rid").as[Long].collect().toSeq.sorted
    assert(got == Seq(500L, 501L), s"generated must continue beyond 500, got $got")
  }

  test("identity column as partition column harvests its mark from partitionValues (r12)") {
    import org.apache.spark.sql.types._
    // partition columns never appear in footer stats; the mark must come
    // from the adds' partitionValues instead of failing with a
    // stats-budget error no knob can fix
    val dir = tempTable("create-id-part").toString
    val schema = StructType(Seq(
      IdentityColumns.field("rid", 1L, 1L, allowExplicitInsert = true),
      StructField("v", StringType)))
    GraftWriter.write(spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(3L, "a"),
        org.apache.spark.sql.Row(7L, "b")), schema),
      dir, partitionBy = Seq("rid"))
    val info = DeltaTable.forPath(spark, dir).identityColumns.head
    assert(info.highWaterMark.contains(7L),
      s"mark must come from partitionValues, got ${info.highWaterMark}")
  }

  test("explicit identity marks align to the declared start/step grid (r12)") {
    import org.apache.spark.sql.types._
    // start=1000 step=10, explicit rid=7: below START WITH → no mark;
    // generation starts at 1000. Explicit rid=1003: mark aligns UP to the
    // grid (1010), next generated = 1020 — on the declared arithmetic.
    val below = tempTable("create-id-below").toString
    val schema = StructType(Seq(
      IdentityColumns.field("rid", 1000L, 10L, allowExplicitInsert = true),
      StructField("v", StringType)))
    GraftWriter.write(spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(7L, "a")), schema), below)
    assert(DeltaTable.forPath(spark, below).identityColumns.head.highWaterMark.isEmpty,
      "values below START WITH need no mark")
    GraftWriter.write(Seq("b").toDF("v"), below, SaveMode.Append)
    val gotBelow = DeltaTable.forPath(spark, below).toDF
      .select("rid").as[Long].collect().toSeq.sorted
    assert(gotBelow == Seq(7L, 1000L), s"generation starts at START WITH, got $gotBelow")

    val offGrid = tempTable("create-id-offgrid").toString
    GraftWriter.write(spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1003L, "a")), schema), offGrid)
    assert(DeltaTable.forPath(spark, offGrid).identityColumns.head
      .highWaterMark.contains(1010L), "mark must align UP onto the grid")
    GraftWriter.write(Seq("b").toDF("v"), offGrid, SaveMode.Append)
    val gotOff = DeltaTable.forPath(spark, offGrid).toDF
      .select("rid").as[Long].collect().toSeq.sorted
    assert(gotOff == Seq(1003L, 1020L),
      s"generated values stay on the declared grid, got $gotOff")
  }

  test("explicit identity values at create and replace advance the high-water mark (r12)") {
    import org.apache.spark.sql.types._
    val dir = tempTable("evolve-idhwm").toString
    val schema = StructType(Seq(
      IdentityColumns.field("rid", 1L, 1L, allowExplicitInsert = true),
      StructField("v", StringType)))
    val rows = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(100L, "a")), schema)
    GraftWriter.write(rows, dir)
    val info = DeltaTable.forPath(spark, dir).identityColumns.head
    assert(info.highWaterMark.contains(100L),
      s"create with explicit rid=100 must record the mark, got ${info.highWaterMark}")
    // first generated insert starts beyond the explicit values
    GraftWriter.write(Seq("b").toDF("v"), dir, SaveMode.Append)
    val got = DeltaTable.forPath(spark, dir).toDF
      .select("rid").as[Long].collect().toSeq.sorted
    assert(got == got.distinct.sorted && got.head == 100L && got(1) > 100L,
      s"generated value must exceed the explicit mark, got $got")
  }

  test("overwriteSchema introducing identity columns raises the writer floor (r12)") {
    import org.apache.spark.sql.types._
    val dir = tempTable("evolve-ows-idfloor").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    assert(DeltaLog.forPath(spark, dir).update().minWriterVersion == 2)
    val schema = StructType(Seq(
      IdentityColumns.field("rid", 1L, 1L, allowExplicitInsert = true),
      StructField("v", StringType)))
    val rows = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(10L, "z")), schema)
    GraftWriter.write(rows, dir, SaveMode.Overwrite, overwriteSchema = true)
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.minWriterVersion >= 6,
      s"identity columns demand writer >= 6, got ${snap.minWriterVersion}")
    // and the subsequent omitted-column append generates on the arithmetic
    GraftWriter.write(Seq("w").toDF("v"), dir, SaveMode.Append)
    val got = DeltaTable.forPath(spark, dir).toDF
      .select("rid").as[Long].collect().toSeq.sorted
    assert(got.size == 2 && got.distinct.size == 2)
  }
}
