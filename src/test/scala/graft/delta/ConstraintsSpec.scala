package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Write-path invariants: NOT NULL nullability + delta.constraints.* CHECKs
  * enforced inside the write job, transactionally (no half-writes). */
class ConstraintsSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def mkTable(dir: String): Unit =
    GraftWriter.write((0 until 50).map(i => (i.toLong, i * 10L, s"v$i"))
      .toDF("id", "qty", "v"), dir)

  test("CHECK constraint rejects violating appends, accepts clean ones") {
    val dir = tempTable("chk-append").toString
    mkTable(dir)
    DeltaTable.forPath(spark, dir).addCheckConstraint("qty_nonneg", "qty >= 0")

    GraftWriter.write(Seq((100L, 5L, "ok")).toDF("id", "qty", "v"),
      dir, SaveMode.Append)
    val before = DeltaLog.forPath(spark, dir).update().version
    val e = intercept[Exception] {
      GraftWriter.write(Seq((101L, -1L, "bad")).toDF("id", "qty", "v"),
        dir, SaveMode.Append)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("constraint violated")), s"got: $e")
    // nothing committed, nothing half-written
    assert(DeltaLog.forPath(spark, dir).update().version == before)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 51)
  }

  test("NULL CHECK result passes (SQL semantics); FALSE fails") {
    val dir = tempTable("chk-null").toString
    GraftWriter.write(Seq((1L, Some(10L)), (2L, None: Option[Long]))
      .toDF("id", "qty"), dir)
    DeltaTable.forPath(spark, dir).addCheckConstraint("qty_pos", "qty > 0")
    // null qty → NULL check → passes
    GraftWriter.write(Seq((3L, None: Option[Long])).toDF("id", "qty"),
      dir, SaveMode.Append)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 3)
    intercept[Exception] {
      GraftWriter.write(Seq((4L, Some(0L))).toDF("id", "qty"), dir, SaveMode.Append)
    }
  }

  test("addCheckConstraint validates existing rows first") {
    val dir = tempTable("chk-existing").toString
    mkTable(dir)
    val e = intercept[IllegalStateException] {
      DeltaTable.forPath(spark, dir).addCheckConstraint("impossible", "qty > 100")
    }
    assert(e.getMessage.contains("existing row"))
    // nothing declared
    assert(Constraints.of(DeltaLog.forPath(spark, dir).update()).isEmpty)
  }

  test("UPDATE and MERGE cannot write rows that violate a CHECK") {
    val dir = tempTable("chk-dml").toString
    mkTable(dir)
    DeltaTable.forPath(spark, dir).addCheckConstraint("qty_cap", "qty <= 1000")
    intercept[Exception] {
      Dml.update(spark, dir, col("id") < 5, Map("qty" -> lit(5000L)))
    }
    assert(DeltaTable.forPath(spark, dir).toDF.filter(col("qty") > 1000).count() == 0)
    intercept[Exception] {
      Merge.into(spark, dir, Seq((1L, 9999L)).toDF("id", "qty"),
          col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("qty" -> col("s.qty")))
        .execute()
    }
    // in-range DML still works
    assert(Dml.update(spark, dir, col("id") === 1, Map("qty" -> lit(999L)))
      .rowsAffected == 1)
  }

  test("dropCheckConstraint lifts enforcement") {
    val dir = tempTable("chk-drop").toString
    mkTable(dir)
    val dt = DeltaTable.forPath(spark, dir)
    dt.addCheckConstraint("qty_nonneg", "qty >= 0")
    DeltaTable.forPath(spark, dir).dropCheckConstraint("qty_nonneg")
    GraftWriter.write(Seq((200L, -7L, "now ok")).toDF("id", "qty", "v"),
      dir, SaveMode.Append)
    assert(DeltaTable.forPath(spark, dir).toDF.filter(col("qty") < 0).count() == 1)
  }

  test("declared NOT NULL columns reject null rows on append") {
    val dir = tempTable("chk-notnull").toString
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val df0 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L, "a"))), schema)
    GraftWriter.write(df0, dir)
    assert(!DeltaTable.forPath(spark, dir).schema("id").nullable)

    val dfBad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(null, "b"))),
      StructType(schema.map(_.copy(nullable = true))))
    intercept[Exception] {
      GraftWriter.write(dfBad, dir, SaveMode.Append)
    }
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)
  }

  private def metaField(name: String, dt: DataType,
                        key: String, value: String): StructField =
    StructField(name, dt, nullable = true,
      new MetadataBuilder().putString(key, value).build())

  test("legacy column invariants (delta.invariants) enforce on every write") {
    val dir = tempTable("inv-legacy").toString
    // delta-spark's nested-JSON form in field metadata
    val schema = StructType(Seq(
      StructField("id", LongType),
      metaField("qty", LongType, Constraints.InvariantKey,
        """{"expression":{"expression":"qty >= 0"}}""")))
    val ok = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, 5L), org.apache.spark.sql.Row(2L, 0L))),
      schema)
    GraftWriter.write(ok, dir)
    // the declaration persists in the log schema and binds appends
    assert(Constraints.invariantsOf(
      DeltaLog.forPath(spark, dir).update().schema) == Seq("qty" -> "qty >= 0"))
    val e = intercept[Exception] {
      GraftWriter.write(Seq((3L, -1L)).toDF("id", "qty"), dir, SaveMode.Append)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("INVARIANT")), messages(e).mkString(" | "))
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 2)
    // DML cannot smuggle a violation either
    intercept[Exception] {
      Dml.update(spark, dir, col("id") === 1L, Map("qty" -> lit(-5L)))
    }
    assert(DeltaTable.forPath(spark, dir).toDF
      .filter(col("qty") < 0).count() == 0)
  }

  test("generated partition column: omitted on append, computed, partitions the file") {
    val dir = tempTable("gen-part").toString
    val schema = StructType(Seq(
      StructField("ts", LongType),
      metaField("bucket", LongType, Constraints.GenerationKey, "ts % 3")))
    GraftWriter.write(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row(10L, 1L), org.apache.spark.sql.Row(11L, 2L))),
        schema),
      dir, partitionBy = Seq("bucket"))
    // the CREATE bumped the floor to the protocol's generated-columns tier
    assert(DeltaLog.forPath(spark, dir).update().minWriterVersion >= 4)
    // append WITHOUT the generated column: computed, lands in the right dir
    GraftWriter.write(Seq(Tuple1(12L)).toDF("ts"), dir, SaveMode.Append)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.select("ts", "bucket").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq ==
      Seq((10L, 1L), (11L, 2L), (12L, 0L)))
    assert(dt.snapshot.files.exists(_.partitionValues.get("bucket").contains("0")))
    // UPDATE of the source column auto-recomputes the derivation
    // (delta-spark semantics); untouched rows keep their values
    assert(Dml.update(spark, dir, col("ts") === 10L,
      Map("ts" -> lit(20L))).rowsAffected == 1)
    assert(DeltaTable.forPath(spark, dir).toDF
      .select("ts", "bucket").as[(Long, Long)].collect().sortBy(_._1).toSeq ==
      Seq((11L, 2L), (12L, 0L), (20L, 2L)))
    // an EXPLICIT assignment that contradicts the derivation still aborts
    intercept[Exception] {
      Dml.update(spark, dir, col("ts") === 11L,
        Map("ts" -> lit(21L), "bucket" -> lit(1L)))
    }
    assert(DeltaTable.forPath(spark, dir).toDF
      .filter(col("ts") === 21L).count() == 0)
  }

  test("MERGE re-derives generated columns for updated and inserted rows") {
    val dir = tempTable("gen-merge").toString
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", LongType),
      metaField("bucket", LongType, Constraints.GenerationKey, "ts % 3")))
    GraftWriter.write(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row(1L, 10L, 1L), org.apache.spark.sql.Row(2L, 11L, 2L))),
        schema), dir)
    val src = Seq((1L, 12L), (3L, 13L)).toDF("id", "ts")
      .withColumn("bucket", lit(null).cast(LongType)) // insertAll needs the column
    val m = Merge.into(spark, dir, src.as("s"), col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("ts" -> col("s.ts")))
      .whenNotMatchedInsert(Map("id" -> col("s.id"), "ts" -> col("s.ts")))
      .execute()
    assert(m.rowsUpdated == 1 && m.rowsInserted == 1, m)
    // updated row re-derived (12 % 3 = 0), inserted row derived (13 % 3 = 1),
    // untouched row kept (11 % 3 = 2)
    assert(DeltaTable.forPath(spark, dir).toDF
      .select("id", "ts", "bucket").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq ==
      Seq((1L, 12L, 0L), (2L, 11L, 2L), (3L, 13L, 1L)))
  }

  test("writer-7 generatedColumns feature table commits (enforced, not refused)") {
    val dir = tempTable("gen-w7").toString
    GraftWriter.write(Seq((1L, "1")).toDF("id", "v"), dir)
    val md = DeltaLog.forPath(spark, dir).update().metadata.get
    val genSchema = md.schemaString.replace(
      """"name":"v","type":"string","nullable":true,"metadata":{}""",
      """"name":"v","type":"string","nullable":true,"metadata":{"delta.generationExpression":"CAST(id AS STRING)"}""")
    LogFixtures.writeCommit(java.nio.file.Paths.get(dir), 1, Seq(
      ActionCodec.toJsonLine(ProtocolAction(1, 7,
        writerFeatures = Some(Set("generatedColumns", "invariants")))),
      ActionCodec.toJsonLine(md.copy(schemaString = genSchema))))
    GraftWriter.write(Seq(Tuple1(2L)).toDF("id"), dir, SaveMode.Append)
    assert(DeltaTable.forPath(spark, dir).toDF
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "1"), (2L, "2")))
  }
}
