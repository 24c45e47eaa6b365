package graft.streaming

import graft.SparkTestBase
import graft.delta._
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSinkSpec extends AnyFunSuite with SparkTestBase {
  import graft.delta.LogFixtures.tempTable
  import spark.implicits._

  test("txn idempotence: replaying an epoch is a no-op (action.rs:607-616)") {
    val dir = tempTable("sink-idem").toString
    val sink = new GraftStreamSink(dir, appId = "app-A")
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

    assert(sink.writeBatch(batch, epochId = 0) == 0)
    assert(sink.writeBatch(batch, epochId = 0) == -1L) // replay → skipped
    assert(sink.writeBatch(batch, epochId = 1) == 1)
    assert(sink.writeBatch(batch, epochId = 0) == -1L) // stale epoch → skipped

    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.count() == 4) // exactly two committed batches
    assert(dt.snapshot.appTransactionVersion == Map("app-A" -> 1L))
  }

  test("mergeSchema sink evolves the table schema mid-stream") {
    val dir = tempTable("sink-evolve").toString
    val sink = new GraftStreamSink(dir, appId = "app-ev", mergeSchema = true)
    assert(sink.writeBatch(Seq((1L, "a")).toDF("id", "v"), epochId = 0) == 0)
    assert(sink.writeBatch(Seq((2L, "b", 7.5)).toDF("id", "v", "score"), epochId = 1) == 1)

    val dt = graft.delta.DeltaTable.forPath(spark, dir)
    assert(dt.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    val rows = dt.toDF.orderBy("id")
      .select("id", "score").as[(Long, Option[Double])].collect().toSeq
    assert(rows == Seq((1L, None), (2L, Some(7.5))))
    // strict sink still rejects the widened batch
    val strict = new GraftStreamSink(dir, appId = "app-strict")
    intercept[graft.delta.SchemaMismatchException] {
      strict.writeBatch(Seq((3L, "c", 1.0, true)).toDF("id", "v", "score", "flag"), 0)
    }
  }

  test("sink-created and sink-evolved NTZ columns declare timestampNtz (round 11)") {
    import org.apache.spark.sql.functions.col
    val ntz = Seq((1L, "2024-01-02 03:04:05")).toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp_ntz").as("ts"))

    // creation epoch: schema-gated feature fenced alongside the metadata
    val dir = tempTable("sink-ntz").toString
    val sink = new GraftStreamSink(dir, appId = "app-ntz")
    assert(sink.writeBatch(ntz, epochId = 0) == 0)
    val snap = graft.delta.DeltaLog.forPath(spark, dir).update()
    assert(snap.metadata.get.schemaString.contains("timestamp_ntz"))
    assert(snap.readerFeatures.exists(_.contains("timestampNtz")) &&
           snap.writerFeatures.exists(_.contains("timestampNtz")))

    // evolution epoch: an NTZ column arriving mid-stream fences too
    val dir2 = tempTable("sink-ntz-ev").toString
    val sink2 = new GraftStreamSink(dir2, appId = "app-ntz-ev", mergeSchema = true)
    assert(sink2.writeBatch(Seq((1L, "a")).toDF("id", "v"), epochId = 0) == 0)
    assert(sink2.writeBatch(
      Seq((2L, "b")).toDF("id", "v").crossJoin(ntz.select("ts")), epochId = 1) == 1)
    val snap2 = graft.delta.DeltaLog.forPath(spark, dir2).update()
    assert(snap2.metadata.get.schemaString.contains("timestamp_ntz"))
    assert(snap2.readerFeatures.exists(_.contains("timestampNtz")) &&
           snap2.writerFeatures.exists(_.contains("timestampNtz")))
  }

  test("two apps keep independent idempotence cursors") {
    val dir = tempTable("sink-2apps").toString
    val a = new GraftStreamSink(dir, appId = "app-A")
    val b = new GraftStreamSink(dir, appId = "app-B")
    val batch = Seq((1L, "x")).toDF("id", "v")
    a.writeBatch(batch, 0)
    assert(b.writeBatch(batch, 0) >= 0) // different app: not skipped
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.appTransactionVersion == Map("app-A" -> 0L, "app-B" -> 0L))
  }

  test("StreamingUpdate commit metadata carries outputMode/queryId/epochId (action.rs:792-800)") {
    val dir = tempTable("sink-meta").toString
    val sink = new GraftStreamSink(dir, appId = "app-A", outputMode = "Append", queryId = "q-1")
    sink.writeBatch(Seq((1L, "x")).toDF("id", "v"), 7)
    val info = DeltaTable.forPath(spark, dir).history
      .find(n => n.get("operation") != null && n.get("operation").asText == "STREAMING UPDATE")
      .get
    val params = info.get("operationParameters")
    assert(params.get("outputMode").asText == "Append")
    assert(params.get("queryId").asText == "q-1")
    assert(params.get("epochId").asLong == 7)
  }

  test("end-to-end: MemoryStream → foreachBatch → Delta table") {
    val dir = tempTable("sink-e2e").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val sink = new GraftStreamSink(dir, appId = "e2e")
    val q = mem.toDF().writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, epoch: Long) =>
        { sink.writeBatch(df, epoch); () })
      .trigger(Trigger.AvailableNow())
      .start()
    mem.addData(1L to 100L: _*)
    q.awaitTermination(60000)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.as[Long].collect().sorted.toSeq == (1L to 100L))
    assert(dt.snapshot.appTransactionVersion.contains("e2e"))
  }
}

class DeltaPipelineSpec extends AnyFunSuite with SparkTestBase {
  import graft.delta.LogFixtures.tempTable
  import spark.implicits._

  test("delta→delta replication: tailer source feeding the exactly-once sink") {
    val src = tempTable("pipe-src").toString
    val dst = tempTable("pipe-dst").toString
    GraftWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src)

    val tailer = DeltaTailer.fromStart(DeltaLog.forPath(spark, src))
    val sink = new GraftStreamSink(dst, appId = "replicator")

    def drain(): Unit =
      Iterator.continually(tailer.nextBatch()).takeWhile(_.isDefined).flatten
        .foreach { case (version, batch) => sink.writeBatch(batch, version) }

    drain() // replicates v0
    GraftWriter.write(Seq((3L, "c")).toDF("id", "v"), src, SaveMode.Append)
    GraftWriter.write(Seq((4L, "d")).toDF("id", "v"), src, SaveMode.Append)
    drain() // replicates v1+v2 (one batch, epoch = src version 2)

    val out = DeltaTable.forPath(spark, dst).toDF.as[(Long, String)].collect().sorted
    assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // replaying the same epochs is a no-op (exactly-once across the pipe)
    val tailer2 = DeltaTailer.fromStart(DeltaLog.forPath(spark, src))
    Iterator.continually(tailer2.nextBatch()).takeWhile(_.isDefined).flatten
      .foreach { case (version, batch) => sink.writeBatch(batch, version) }
    assert(DeltaTable.forPath(spark, dst).toDF.count() == 4)
  }
}

class DeltaTailerSpec extends AnyFunSuite with SparkTestBase {
  import graft.delta.LogFixtures.tempTable
  import spark.implicits._

  test("poll emits exactly the newly added rows per version (delta.rs:635-638)") {
    val dir = tempTable("tail-basic").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    val tailer = DeltaTailer.fromStart(log)

    val Some((v0, b0)) = tailer.nextBatch()
    assert(v0 == 0 && b0.as[(Long, String)].collect().toSet == Set((1L, "a")))
    assert(tailer.nextBatch().isEmpty) // idle

    GraftWriter.write(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dir, SaveMode.Append)
    GraftWriter.write(Seq((4L, "d")).toDF("id", "v"), dir, SaveMode.Append)
    val Some((v2, b1)) = tailer.nextBatch()
    assert(v2 == 2)
    assert(b1.as[(Long, String)].collect().map(_._1).sorted.toSeq == Seq(2L, 3L, 4L))
  }

  test("fromLatest sees only future commits") {
    val dir = tempTable("tail-latest").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val tailer = DeltaTailer.fromLatest(DeltaLog.forPath(spark, dir))
    assert(tailer.nextBatch().isEmpty)
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    val Some((_, b)) = tailer.nextBatch()
    assert(b.as[(Long, String)].collect().toSet == Set((2L, "b")))
  }

  test("dataChange=false files are skipped (compaction commits, action.rs:166-170)") {
    val dir = tempTable("tail-compact").toString
    GraftWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    val tailer = DeltaTailer.fromStart(log)
    tailer.nextBatch() // consume v0

    // simulate a compaction: rewrite all files as one, dataChange = false
    val snap = log.update()
    val compacted = GraftWriter.stageFiles(
      DeltaTable.forPath(spark, dir).toDF.coalesce(1), dir, Nil)
    val txn = log.startTransaction()
    snap.files.foreach(f => txn.addAction(RemoveAction(
      f.path, System.currentTimeMillis(), dataChange = false)))
    txn.addActions(compacted.map(_.copy(dataChange = false)))
    txn.commit()

    val Some((v, batch)) = tailer.nextBatch() // log advanced…
    assert(batch.count() == 0) // …but no re-emitted rows
    // and the table itself still reads correctly post-compaction
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 2)
  }
}
