package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the round-10 streaming-tier review — one test per
  * found failure scenario. */
class StreamingReviewSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("timestampAsOf accepts the ISO string the catalog path supplies") {
    val dir = tempTable("sr-ts-iso").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    Thread.sleep(1100)
    val mid = java.time.Instant.now().toString
    Thread.sleep(1100)
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    assert(spark.read.format("graft-delta")
      .option("timestampAsOf", mid).load(dir).count() == 1)
    // epoch millis keep working
    assert(spark.read.format("graft-delta")
      .option("timestampAsOf", System.currentTimeMillis().toString)
      .load(dir).count() == 2)
  }

  test("format write to a column-mapped table reports SUCCESS (no post-commit read fence)") {
    val dir = tempTable("sr-mapped-write").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    ColumnMappingDdl.enableNameMapping(spark, dir)
    // previously: the write committed, then building the returned read
    // relation threw UnsupportedProtocolException — a reported failure
    // after a durable commit (orchestrator retries would duplicate)
    Seq((2L, "b")).toDF("id", "v").write.format("graft-delta")
      .mode("append").save(dir)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 2)
  }

  test("streaming sink inherits the table's partitioning; a mismatch refuses") {
    val dir = tempTable("sr-sink-parts").toString
    GraftWriter.write(Seq((1L, 2020, "a")).toDF("id", "year", "v"), dir,
      partitionBy = Seq("year"))
    // omitted partitionBy: inherit, never commit unpartitioned files
    val sink = new graft.streaming.GraftStreamSink(dir, appId = "sr-app")
    sink.writeBatch(Seq((2L, 2021, "b")).toDF("id", "year", "v"), 0L)
    val s = DeltaLog.forPath(spark, dir).update()
    assert(s.files.forall(_.partitionValues.keySet == Set("year")),
      s"unpartitioned files landed: ${s.files.map(_.partitionValues)}")
    assert(DeltaTable.forPath(spark, dir)
      .toDF(Seq(PartitionFilter.Eq("year", "2021"))).count() == 1)
    // declared mismatch refuses
    val bad = new graft.streaming.GraftStreamSink(dir, appId = "sr-app2",
      partitionBy = Seq("v"))
    intercept[IllegalArgumentException](
      bad.writeBatch(Seq((3L, 2022, "c")).toDF("id", "year", "v"), 0L))
  }

  test("Complete output mode REPLACES table contents per epoch; Update refuses") {
    val dir = tempTable("sr-sink-complete").toString
    val sink = new graft.streaming.GraftStreamSink(dir, appId = "sr-agg",
      outputMode = "Complete")
    sink.writeBatch(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), 0L)
    sink.writeBatch(Seq(("a", 5L), ("b", 6L), ("c", 1L)).toDF("k", "n"), 1L)
    val rows = DeltaTable.forPath(spark, dir).toDF.orderBy("k")
      .as[(String, Long)].collect().toSeq
    assert(rows == Seq(("a", 5L), ("b", 6L), ("c", 1L)),
      s"Complete mode must not stack epochs: $rows")
    // Update refuses at CONSTRUCTION since r12 — the old post-staging
    // check orphaned a micro-batch of parquet per start attempt
    intercept[IllegalArgumentException](
      new graft.streaming.GraftStreamSink(dir, appId = "sr-upd",
        outputMode = "Update"))
  }

  test("stream START fences an unsupported standing protocol") {
    val dirP = tempTable("sr-start-fence")
    val dir = dirP.toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    LogFixtures.writeCommit(dirP, 1,
      Seq("""{"protocol":{"minReaderVersion":3,"readerFeatures":["someFutureReaderFeature"],"minWriterVersion":7,"writerFeatures":["someFutureReaderFeature"]}}"""))
    val ckpt = tempTable("sr-start-fence-ck").toString
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "2").load(dir)
        .writeStream.format("memory").queryName("sr_start_fence")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("someFutureReaderFeature")),
      s"stream served an unsupported protocol: ${chain(e)}")
  }

  test("mid-stream column DROP fails the stream instead of serving nulls") {
    val src = tempTable("sr-schema-drop").toString
    Seq((1L, "a")).toDF("id", "v").write.format("graft-delta").save(src)
    val ckpt = tempTable("sr-schema-drop-ck").toString
    val q = spark.readStream.format("graft-delta").load(src)
      .writeStream.format("memory").queryName("sr_schema_drop")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    // drop column v via overwriteSchema, then append data without it
    GraftWriter.write(Seq(2L).toDF("id"), src, SaveMode.Overwrite,
      overwriteSchema = true)
    GraftWriter.write(Seq(3L).toDF("id"), src, SaveMode.Append)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m => m.contains("drops or renames")),
      s"expected the schema-drop fence, got: ${chain(e)}")
  }

  test("CDF stream declared WITH explicit change columns does not double-append them") {
    val src = tempTable("sr-cdf-schema").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft-delta")
      .save(src)
    val declared = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(ChangeDataFeed.ChangeType,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(ChangeDataFeed.CommitVersion,
        org.apache.spark.sql.types.LongType, nullable = false)))
    val df = spark.readStream.format("graft-delta")
      .schema(declared).option("readChangeFeed", "true").load(src)
    assert(df.schema.fieldNames.count(_ == ChangeDataFeed.ChangeType) == 1,
      s"duplicated change columns: ${df.schema.fieldNames.toSeq}")
    val ckpt = tempTable("sr-cdf-schema-ck").toString
    val q = df.writeStream.format("memory").queryName("sr_cdf_schema")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("sr_cdf_schema").count() == 2) // initial inserts
    } finally q.stop()
  }
}
