package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Variant columns (`variantType` feature): Spark 4's VariantType flows
  * through the schemaString, protocol fencing, writes, scans, DML, and
  * checkpoints. */
class VariantTypeSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def variantDf(rows: (Long, String)*) =
    rows.toSeq.toDF("id", "j").select(col("id"), parse_json(col("j")).as("payload"))

  test("schemaString round-trips variant; validate accepts it") {
    val df = variantDf((1L, """{"a":1}"""))
    val json = DeltaSchema.toJson(df.schema)
    assert(json.contains("\"variant\""))
    assert(DeltaSchema.fromJson(json)("payload").dataType ==
      org.apache.spark.sql.types.VariantType)
    assert(DeltaSchema.hasVariant(df.schema))
  }

  test("a table born with a variant column declares the feature and round-trips values") {
    val dir = tempTable("variant-born").toString
    GraftWriter.write(variantDf(
      (1L, """{"kind":"a","n":1}"""),
      (2L, """[1,2,3]"""),
      (3L, """"plain string"""")), dir)
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.minReaderVersion == 3 && snap.minWriterVersion == 7)
    assert(snap.readerFeatures.getOrElse(Set.empty).contains("variantType"))
    assert(snap.writerFeatures.getOrElse(Set.empty).contains("variantType"))

    GraftWriter.write(variantDf((4L, """{"kind":"b"}""")), dir, SaveMode.Append)
    val got = DeltaTable.forPath(spark, dir).toDF
      .select(col("id"), to_json(col("payload")).as("s"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, """{"kind":"a","n":1}"""),
      (2L, "[1,2,3]"),
      (3L, "\"plain string\""),
      (4L, """{"kind":"b"}""")))
    // variant_get serves typed access through the scan
    val n = DeltaTable.forPath(spark, dir).toDF
      .select(try_variant_get(col("payload"), "$.n", "int").as("n"))
      .filter(col("n").isNotNull).count()
    assert(n == 1)
  }

  test("DML and checkpoints carry variant columns") {
    val dir = tempTable("variant-dml").toString
    GraftWriter.write(variantDf(
      (1L, """{"keep":true}"""), (2L, """{"keep":false}""")), dir)
    Dml.delete(spark, dir, col("id") === 2L)
    DeltaLog.forPath(spark, dir).checkpoint()
    val cold = DeltaTable.forPath(spark, dir).toDF
      .select(col("id"), to_json(col("payload")).as("s"))
      .as[(Long, String)].collect().toSeq
    assert(cold == Seq((1L, """{"keep":true}""")))
  }

  test("a foreign table declaring variantType-preview is served") {
    val dir = tempTable("variant-preview").toString
    GraftWriter.write(variantDf((1L, """{"x":1}""")), dir)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    log.startTransaction().addAction(ProtocolAction(3, 7,
      Some(Set("variantType-preview")), Some(Set("variantType-preview"))))
      .commit()
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)
    assert(snap.version >= 0)
  }
}
