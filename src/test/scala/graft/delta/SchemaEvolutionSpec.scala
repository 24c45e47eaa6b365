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
