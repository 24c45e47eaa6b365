package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** Type widening (`typeWidening` reader+writer feature): tables whose
  * schema widened after data was written — old parquet files carry the
  * NARROW physical type, the table schema the WIDE one. Spark 4's parquet
  * readers upcast natively, so serving these tables is a protocol
  * acceptance question, not an engine change. */
class TypeWideningSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("probe: Spark parquet readers upcast int32 files under a long read schema") {
    val dir = tempTable("widen-probe").toString
    Seq((1, 1.0f), (2, 2.5f)).toDF("i", "f").write.mode("overwrite").parquet(dir)
    val widened = spark.read
      .schema("i LONG, f DOUBLE")
      .parquet(dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(widened.toSeq == Seq((1L, 1.0d), (2L, 2.5d)))
  }

  test("a widened table (narrow files under a wide schema) scans correctly") {
    val dirP = tempTable("widen-table")
    val dir = dirP.toString
    // stage a parquet file with int32 `id`
    val data = tempTable("widen-data").toString
    Seq((7, "a"), (9, "b")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(data)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(data))
      .toArray.map(_.toString).find(_.endsWith(".parquet")).get
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.copy(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(dir, "narrow.parquet"))
    val size = java.nio.file.Files.size(java.nio.file.Paths.get(dir, "narrow.parquet"))
    // log declares the WIDE schema (id long) + the typeWidening feature,
    // the delta-spark shape after ALTER COLUMN TYPE
    val wideSchema =
      """{\"type\":\"struct\",\"fields\":[
        |{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},
        |{\"name\":\"v\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
        .stripMargin.replace("\n", "")
    LogFixtures.writeCommit(dirP, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""",
      s"""{"metaData":{"id":"w1de0000-0000-4000-8000-000000000001","format":{"provider":"parquet","options":{}},"schemaString":"$wideSchema","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"narrow.parquet","partitionValues":{},"size":$size,"modificationTime":1700000000000,"dataChange":true}}"""))

    val t = DeltaTable.forPath(spark, dir)
    assert(t.schema("id").dataType == org.apache.spark.sql.types.LongType)
    val rows = t.toDF.select("id", "v").as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((7L, "a"), (9L, "b")))
    // and a write AFTER the widening appends wide files that coexist
    GraftWriter.write(Seq((5000000000L, "c")).toDF("id", "v"), dir, SaveMode.Append)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 3)
  }
}
