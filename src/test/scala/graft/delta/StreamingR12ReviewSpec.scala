package graft.delta

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the r12 streaming-tier review findings. */
class StreamingR12ReviewSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def classicSpark = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  test("streamed partitioned table with partition column FIRST serves unscrambled columns") {
    // Spark moves hive-partition columns to the END of a relation even
    // under an explicit schema; the source's raw internal-row relabel
    // used to serve x's bytes as p on (p, x)-partitioned tables.
    val src = Files.createTempDirectory("r12-ppfirst-").toString
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("p", "x")
      .write.format("graft-delta").option("partitionBy", "p").save(src)
    val q = spark.readStream.format("graft-delta").load(src)
      .writeStream.format("memory").queryName("r12_ppfirst")
      .option("checkpointLocation", Files.createTempDirectory("r12-ck-").toString)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("r12_ppfirst").orderBy("p")
        .as[(Int, String)].collect().toSeq
      assert(rows == Seq((1, "a"), (2, "b"), (3, "c")),
        s"columns scrambled: $rows")
    } finally q.stop()
  }

  test("DeltaTailer batches keep snap.schema column order on partition-first tables") {
    val src = Files.createTempDirectory("r12-tailer-").toString
    val log = DeltaLog.forPath(spark, src)
    val tailer = graft.streaming.DeltaTailer.fromStart(log)
    Seq((7, "z"), (8, "y")).toDF("p", "x")
      .write.format("graft-delta").option("partitionBy", "p").save(src)
    val Some((_, batch)) = tailer.nextBatch()
    assert(batch.schema.fieldNames.toSeq == Seq("p", "x"))
    assert(batch.orderBy("p").as[(Int, String)].collect().toSeq ==
      Seq((7, "z"), (8, "y")))
  }

  test("concurrent txn actions for the same appId conflict instead of committing twice") {
    val dir = LogFixtures.tempTable("r12-txnrace")
    LogFixtures.writeCommit(dir, 0, Seq(LogFixtures.protocol, LogFixtures.metaData))
    val log1 = DeltaLog.forPath(spark, dir.toString)
    val log2 = DeltaLog.forPath(spark, dir.toString)
    log1.update(); log2.update()
    // both writers believe epoch 5 is uncommitted; the loser must ABORT
    // (and its caller re-check the idempotence gate), not blind-retry
    val t1 = log1.startTransaction().addAction(TxnAction("app-r12", 5L))
    val t2 = log2.startTransaction().addAction(TxnAction("app-r12", 5L))
    assert(t1.commit() == 1L)
    intercept[ConcurrentTransactionException] { t2.commit() }
    // a DIFFERENT appId still commutes with the winner
    val t3 = log2.startTransaction().addAction(TxnAction("other-app", 5L))
    assert(t3.commit() == 2L)
  }

  test("sink skips a same-epoch duplicate that lost the txn race") {
    val dir = Files.createTempDirectory("r12-sinkrace-").toString
    val sinkA = new graft.streaming.GraftStreamSink(dir, appId = "race-app")
    val sinkB = new graft.streaming.GraftStreamSink(dir, appId = "race-app")
    assert(sinkA.writeBatch(Seq((1L, "a")).toDF("id", "v"), epochId = 0) >= 0)
    // sequential duplicate delivery: B sees the gate and skips
    assert(sinkB.writeBatch(Seq((1L, "a")).toDF("id", "v"), epochId = 0) == -1L)
    assert(spark.read.format("graft-delta").load(dir).count() == 1)
  }

  test("unsupported outputMode refuses at construction, before any staging I/O") {
    intercept[IllegalArgumentException] {
      new graft.streaming.GraftStreamSink("/tmp/never-used", appId = "x",
        outputMode = "Update")
    }
  }

  test("throttle anchor survives restart via value-in-name files; legacy content file still read") {
    val src = Files.createTempDirectory("r12-anchor-").toString
    (0 until 3).foreach { i =>
      Seq((i, s"v$i")).toDF("id", "v").write.format("graft-delta")
        .mode(if (i == 0) "errorifexists" else "append").save(src)
    }
    val meta = Files.createTempDirectory("r12-anchor-meta-").toString
    val log = DeltaLog.forPath(spark, src)
    val schema = log.update().schema
    val s1 = new org.apache.spark.sql.graftbridge.GraftDeltaStreamSource(
      classicSpark, log, schema, maxVersionsPerTrigger = Some(1),
      metadataPath = Some(meta))
    val o1 = s1.getOffset.get.toString
    // the anchor landed as a value-suffixed file (crash-safe: written
    // create-new before any old anchor is deleted)
    val anchors = Files.list(java.nio.file.Paths.get(meta)).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(anchors)
      .asScala.map(_.getFileName.toString).filterNot(_.startsWith(".")).toSeq
    assert(names.exists(_.matches("graft-throttle-anchor\\.\\d+")), names.toString)
    // a fresh source over the same metadataPath resumes at the anchor —
    // its first offer must not regress below s1's
    val s2 = new org.apache.spark.sql.graftbridge.GraftDeltaStreamSource(
      classicSpark, DeltaLog.forPath(spark, src), schema,
      maxVersionsPerTrigger = Some(1), metadataPath = Some(meta))
    assert(s2.getOffset.get.toString.toLong >= o1.toLong)
    // legacy plain anchor file (older builds wrote content, no suffix)
    val meta2 = Files.createTempDirectory("r12-anchor-legacy-").toString
    Files.writeString(java.nio.file.Paths.get(meta2, "graft-throttle-anchor"), "2")
    val s3 = new org.apache.spark.sql.graftbridge.GraftDeltaStreamSource(
      classicSpark, DeltaLog.forPath(spark, src), schema,
      maxVersionsPerTrigger = Some(1), metadataPath = Some(meta2))
    assert(s3.getOffset.get.toString.toLong >= 2L)
  }

  test("equal-suffix anchor replay still reclaims lower anchors and the legacy file (r13 advice)") {
    val src = Files.createTempDirectory("r13-anchor-eq-").toString
    (0 until 3).foreach { i =>
      Seq((i, s"v$i")).toDF("id", "v").write.format("graft-delta")
        .mode(if (i == 0) "errorifexists" else "append").save(src)
    }
    // crash aftermath: the anchor for the latest version (2) already
    // exists, a stale lower anchor lingers, and the legacy content file is
    // corrupt — so readAnchor() floors and the restart re-offers version 2
    val meta = Files.createTempDirectory("r13-anchor-eq-meta-")
    Files.createFile(meta.resolve("graft-throttle-anchor.0"))
    Files.createFile(meta.resolve("graft-throttle-anchor.2"))
    Files.writeString(meta.resolve("graft-throttle-anchor"), "not-a-number")
    val log = DeltaLog.forPath(spark, src)
    val s = new org.apache.spark.sql.graftbridge.GraftDeltaStreamSource(
      classicSpark, log, log.update().schema, maxVersionsPerTrigger = Some(100),
      metadataPath = Some(meta.toString))
    assert(s.getOffset.get.toString.toLong == 2L)
    // the equal-suffix skip branch used to skip the reclaim too, leaving
    // this garbage until the offered version advanced
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(meta).iterator()).asScala.map(_.getFileName.toString)
      .filterNot(_.startsWith(".")).toSeq.sorted
    assert(names == Seq("graft-throttle-anchor.2"), names.toString)
  }

  test("checkpointed offset takes precedence over a raised startingVersion") {
    val src = Files.createTempDirectory("r12-startv-").toString
    val ck = Files.createTempDirectory("r12-startv-ck-").toString
    (0 until 2).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").write.format("graft-delta")
        .mode(if (i == 0) "errorifexists" else "append").save(src)
    }
    // first run checkpoints offset 1 (both versions served)
    val q1 = spark.readStream.format("graft-delta").load(src)
      .writeStream.format("memory").queryName("r12_sv_a")
      .option("checkpointLocation", ck).start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.table("r12_sv_a").count() == 2)
    // versions 2 and 3 land while the query is down
    (2 until 4).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").write.format("graft-delta")
        .mode("append").save(src)
    }
    // restart from the SAME checkpoint with a raised startingVersion
    // (floor = 2): the checkpointed offset 1 must win — versions 2 AND 3
    // are committed-but-unserved and must both arrive (max(start, floor)
    // used to silently drop version 2 — r12 review)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q2 = spark.readStream.format("graft-delta")
      .option("startingVersion", 3).load(src)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").collect().foreach(r => seen.add(r.getLong(0))): Unit
      }
      .option("checkpointLocation", ck).start()
    try { q2.processAllAvailable() } finally q2.stop()
    val ids = scala.jdk.CollectionConverters.SetHasAsScala(seen).asScala.toSet
    assert(ids == Set(2L, 3L), s"restart lost committed-but-unserved versions: $ids")
  }
}
