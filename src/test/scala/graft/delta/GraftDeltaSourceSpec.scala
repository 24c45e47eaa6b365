package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class GraftDeltaSourceSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("df.write.format + spark.read.format round-trip by short name") {
    val dir = tempTable("fmt-roundtrip").toString
    (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("graft-delta").save(dir)
    assert(DeltaTable.forPath(spark, dir).version == 0)

    val back = spark.read.format("graft-delta").load(dir)
    assert(back.count() == 50)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v"))

    // append + overwrite through the format
    Seq((100L, "x")).toDF("id", "v").write.format("graft-delta").mode("append").save(dir)
    assert(spark.read.format("graft-delta").load(dir).count() == 51)
    Seq((0L, "z")).toDF("id", "v").write.format("graft-delta").mode("overwrite").save(dir)
    assert(spark.read.format("graft-delta").load(dir).count() == 1)
  }

  test("versionAsOf option time-travels") {
    val dir = tempTable("fmt-asof").toString
    Seq((1L, "a")).toDF("id", "v").write.format("graft-delta").save(dir)
    Seq((2L, "b")).toDF("id", "v").write.format("graft-delta").mode("append").save(dir)
    assert(spark.read.format("graft-delta").option("versionAsOf", 0).load(dir).count() == 1)
    assert(spark.read.format("graft-delta").load(dir).count() == 2)
  }

  test("partitionBy option writes hive layout; pushed filters prune") {
    val dir = tempTable("fmt-part").toString
    (0 until 60).map(i => (i.toLong, i % 3)).toDF("id", "p")
      .write.format("graft-delta").option("partitionBy", "p").save(dir)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.partitionColumns == Seq("p"))
    val df = spark.read.format("graft-delta").load(dir).filter(col("p") === 1)
    assert(df.count() == 20)
  }

  test("CREATE TABLE ... USING graft-delta registers a catalog table over the log") {
    val dir = tempTable("fmt-ddl").toString
    (0 until 25).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("graft-delta").save(dir)
    spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
    spark.sql(s"CREATE TABLE graft_ddl_t USING `graft-delta` OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) FROM graft_ddl_t").head.getLong(0) == 25)
      assert(spark.sql("SELECT max(id) FROM graft_ddl_t WHERE id < 10").head.getLong(0) == 9)
    } finally spark.sql("DROP TABLE graft_ddl_t")
  }

  test("readStream.format('graft-delta') tails the log version by version") {
    val src = tempTable("fmt-rsrc").toString
    val dst = tempTable("fmt-rsrc-ckpt").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft-delta").save(src)

    val q = spark.readStream.format("graft-delta").load(src)
      .writeStream.format("memory").queryName("graft_tail")
      .option("checkpointLocation", dst)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_tail").count() == 2)

      Seq((3L, "c")).toDF("id", "v").write.format("graft-delta").mode("append").save(src)
      q.processAllAvailable()
      val rows = spark.table("graft_tail").as[(Long, String)].collect().sorted.toSeq
      assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c"))) // no duplicates
    } finally q.stop()
  }

  test("a rewrite commit fails the stream unless ignoreChanges is set") {
    val src = tempTable("fmt-rewrite-guard").toString
    (0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
      .write.format("graft-delta").save(src)
    Dml.delete(spark, src, col("id") < 5) // copy-on-write rewrite commit

    // without the option: the stream must fail loudly, not duplicate rows
    val ckpt1 = tempTable("fmt-rewrite-ck1").toString
    val q1 = spark.readStream.format("graft-delta").load(src)
      .writeStream.format("memory").queryName("graft_rw_guard")
      .option("checkpointLocation", ckpt1).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    assert(e.getMessage.contains("ignoreChanges") ||
      Option(e.getCause).exists(_.getMessage.contains("ignoreChanges")))
    q1.stop()

    // with the option: the rewrite's surviving rows are (knowingly) served
    val ckpt2 = tempTable("fmt-rewrite-ck2").toString
    val q2 = spark.readStream.format("graft-delta")
      .option("ignoreChanges", "true").load(src)
      .writeStream.format("memory").queryName("graft_rw_ok")
      .option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("graft_rw_ok").count() == 35) // 20 initial + 15 survivors
    } finally q2.stop()
  }

  test("a delete-only commit fails the stream unless ignoreDeletes is set") {
    val src = tempTable("fmt-delete-guard").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft-delta").save(src)
    // pure-remove commit (TRUNCATE shape)
    val log = DeltaLog.forPath(spark, src)
    val snap = log.update()
    val txn = log.startTransaction()
    snap.files.foreach(f => txn.addAction(RemoveAction(
      path = f.path, deletionTimestamp = 1L, dataChange = true)))
    txn.commit()

    val ckpt1 = tempTable("fmt-delete-ck1").toString
    val q1 = spark.readStream.format("graft-delta").load(src)
      .writeStream.format("memory").queryName("graft_del_guard")
      .option("checkpointLocation", ckpt1).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    assert(e.getMessage.contains("ignoreDeletes") ||
      Option(e.getCause).exists(_.getMessage.contains("ignoreDeletes")))
    q1.stop()

    val ckpt2 = tempTable("fmt-delete-ck2").toString
    val q2 = spark.readStream.format("graft-delta")
      .option("ignoreDeletes", "true").load(src)
      .writeStream.format("memory").queryName("graft_del_ok")
      .option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("graft_del_ok").count() == 2) // the initial adds only
    } finally q2.stop()
  }

  test("a DV DELETE fails the stream unless ignoreDeletes is set") {
    // Regression (ADVICE r6): merge-on-read DELETE is remove + same-path
    // re-add with a DV pointer — no realRemoves, no served adds — and the
    // old fence exempted ALL same-path re-adds, so row deletions slipped
    // through with no opt-in. The DV re-point must gate like a delete.
    val src = tempTable("fmt-dv-guard").toString
    (0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("graft-delta").save(src)
    DeltaTable.forPath(spark, src)
      .setProperties(Map(TableConfig.EnableDeletionVectors -> "true"))
    Dml.delete(spark, src, col("id") < 5) // merge-on-read: remove+re-add

    val ckpt1 = tempTable("fmt-dv-ck1").toString
    val q1 = spark.readStream.format("graft-delta").load(src)
      .writeStream.format("memory").queryName("graft_dv_guard")
      .option("checkpointLocation", ckpt1).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    assert(e.getMessage.contains("ignoreDeletes") ||
      Option(e.getCause).exists(_.getMessage.contains("ignoreDeletes")))
    q1.stop()

    // with the opt-in: the pointer re-add serves nothing (rows just vanish)
    val ckpt2 = tempTable("fmt-dv-ck2").toString
    val q2 = spark.readStream.format("graft-delta")
      .option("ignoreDeletes", "true").load(src)
      .writeStream.format("memory").queryName("graft_dv_ok")
      .option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("graft_dv_ok").count() == 20)
    } finally q2.stop()
  }

  test("a DV UPDATE fails the stream unless ignoreChanges is set") {
    // DV UPDATE = pointer re-add (masking old rows) + fresh adds carrying
    // the transformed copies of already-served rows: serving those copies
    // as inserts duplicates data downstream, so it gates on ignoreChanges
    // (ignoreDeletes is NOT enough — there are new files).
    val src = tempTable("fmt-dvu-guard").toString
    (0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("graft-delta").save(src)
    DeltaTable.forPath(spark, src)
      .setProperties(Map(TableConfig.EnableDeletionVectors -> "true"))
    Dml.update(spark, src, col("id") < 5, Map("v" -> org.apache.spark.sql.functions.lit("upd")))

    val ckpt1 = tempTable("fmt-dvu-ck1").toString
    val q1 = spark.readStream.format("graft-delta")
      .option("ignoreDeletes", "true") // deliberately insufficient
      .load(src)
      .writeStream.format("memory").queryName("graft_dvu_guard")
      .option("checkpointLocation", ckpt1).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    assert(e.getMessage.contains("ignoreChanges") ||
      Option(e.getCause).exists(_.getMessage.contains("ignoreChanges")))
    q1.stop()

    // with ignoreChanges: the updated copies are (knowingly) served
    val ckpt2 = tempTable("fmt-dvu-ck2").toString
    val q2 = spark.readStream.format("graft-delta")
      .option("ignoreChanges", "true").load(src)
      .writeStream.format("memory").queryName("graft_dvu_ok")
      .option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("graft_dvu_ok").count() == 25) // 20 initial + 5 copies
    } finally q2.stop()
  }

  test("readChangeFeed streams row-level changes: UPDATE yields pre/post images, restart-safe") {
    val src = tempTable("fmt-cdf-stream").toString
    val dst = tempTable("fmt-cdf-stream-dst").toString
    val ckpt = tempTable("fmt-cdf-stream-ck").toString
    (0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("graft-delta").save(src)
    DeltaTable.forPath(spark, src)
      .setProperties(Map(TableConfig.EnableChangeDataFeed -> "true"))

    // delta→delta so each restart recovers from the checkpoint (the memory
    // sink cannot) — duplicates from a replayed version would land in dst
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-delta")
        .option("appId", "cdf-stream")
        .option("checkpointLocation", ckpt).start(dst)
      try q.processAllAvailable() finally q.stop()
    }

    run() // backfill: the initial commit's rows surface as inserts
    val t0 = DeltaTable.forPath(spark, dst).toDF
    assert(t0.schema.fieldNames.toSeq ==
      Seq("id", "v", ChangeDataFeed.ChangeType, ChangeDataFeed.CommitVersion))
    assert(t0.filter(col(ChangeDataFeed.ChangeType) === "insert").count() == 20)

    // an UPDATE between restarts serves pre/post images — no opt-in needed
    // (the CDF feed replaces the append-mode rewrite guard)
    val m = Dml.update(spark, src, col("id") < 3,
      Map("v" -> org.apache.spark.sql.functions.lit("X")))
    run()
    val t1 = DeltaTable.forPath(spark, dst).toDF
    val pre = t1.filter(col(ChangeDataFeed.ChangeType) === "update_preimage")
    val post = t1.filter(col(ChangeDataFeed.ChangeType) === "update_postimage")
    assert(pre.count() == 3 && post.count() == 3)
    assert(post.select("v").distinct().as[String].head() == "X")
    assert(pre.select(ChangeDataFeed.CommitVersion).distinct().as[Long].head() == m.version)

    // third leg: a DELETE, then restart — exactly-once across all three
    // runs (20 inserts + 3 pre + 3 post + 1 delete, nothing replayed)
    Dml.delete(spark, src, col("id") === 10L)
    run()
    val t2 = DeltaTable.forPath(spark, dst).toDF
    assert(t2.filter(col(ChangeDataFeed.ChangeType) === "delete")
      .select("id").as[Long].collect().toSeq == Seq(10L))
    assert(t2.count() == 27, s"expected exactly-once feed, got ${t2.count()} rows")
  }

  test("readChangeFeed fails loudly on a rewrite committed without capture") {
    // a DML commit made BEFORE delta.enableChangeDataFeed was set has no
    // _change_data — serving it would mean silently inventing or dropping
    // row-level changes, so the stream must fail, mirroring the batch
    // feed's contract (ChangeDataFeedSpec "pre-CDF commits")
    val src = tempTable("fmt-cdf-precapture").toString
    (0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
      .write.format("graft-delta").save(src)
    Dml.delete(spark, src, col("id") < 3) // CoW rewrite, capture OFF
    DeltaTable.forPath(spark, src)
      .setProperties(Map(TableConfig.EnableChangeDataFeed -> "true"))

    val ckpt = tempTable("fmt-cdf-precapture-ck").toString
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true").load(src)
      .writeStream.format("memory").queryName("graft_cdf_pre")
      .option("checkpointLocation", ckpt).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("change data")),
      s"expected the no-capture failure, got: ${msgs(e)}")
    q.stop()
  }

  test("readChangeFeed composes with startingVersion and maxVersionsPerTrigger") {
    val src = tempTable("fmt-cdf-compose").toString
    val ckpt = tempTable("fmt-cdf-compose-ck").toString
    Seq((1L, "a")).toDF("id", "v").write.format("graft-delta").save(src)
    DeltaTable.forPath(spark, src)
      .setProperties(Map(TableConfig.EnableChangeDataFeed -> "true"))
    val afterProps = DeltaLog.forPath(spark, src).update().version
    (0 until 3).foreach { i =>
      Seq((10L + i, s"n$i")).toDF("id", "v").write.format("graft-delta")
        .mode("append").save(src)
    }

    // start past the backfill AND the props commit; one version per batch
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
      .option("startingVersion", afterProps + 1)
      .option("maxVersionsPerTrigger", 1)
      .load(src)
      .writeStream.format("memory").queryName("graft_cdf_compose")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val t = spark.table("graft_cdf_compose")
      // only the three appends, as inserts, across >= 3 micro-batches
      assert(t.count() == 3)
      assert(t.select("id").as[Long].collect().sorted.toSeq == Seq(10L, 11L, 12L))
      assert(t.select(ChangeDataFeed.ChangeType).distinct().as[String].head() == "insert")
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    } finally q.stop()
  }

  test("streaming source tails a reference-written table (foreign log interop)") {
    // copy a reference-written PARTITIONED table (real data files) and
    // subscribe to it — the stream must serve all its rows and then pick up
    // OUR appends on top of the foreign log
    val gold = java.nio.file.Paths.get(
      "/root/reference/rust/tests/data/delta-0.8.0-partitioned")
    val src = tempTable("fmt-foreign-tail").toString
    java.nio.file.Files.walk(gold).forEach { p =>
      val dst = java.nio.file.Paths.get(src, gold.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val ckpt = tempTable("fmt-foreign-tail-ck").toString
    val expected = DeltaTable.forPath(spark, src).toDF.count()
    assert(expected > 0)

    val q = spark.readStream.format("graft-delta").load(src)
      .writeStream.format("memory").queryName("graft_foreign_tail")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_foreign_tail").count() == expected)

      // append through OUR writer onto the foreign log; the stream follows
      // (year/month/day partitioned — give the partition columns values)
      val schema = DeltaTable.forPath(spark, src).schema
      val row = org.apache.spark.sql.Row.fromSeq(schema.fields.map(f =>
        if (f.name == "value") "ours" else "2099").toSeq)
      val add = spark.createDataFrame(java.util.List.of(row), schema)
      add.write.format("graft-delta").mode("append").save(src)
      q.processAllAvailable()
      assert(spark.table("graft_foreign_tail").count() == expected + 1)
    } finally q.stop()
  }

  test("maxVersionsPerTrigger throttles a backfill into multiple micro-batches") {
    val src = tempTable("fmt-throttle").toString
    val ckpt = tempTable("fmt-throttle-ckpt").toString
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").write.format("graft-delta")
        .mode(if (i == 0) "errorifexists" else "append").save(src)
    }
    val q = spark.readStream.format("graft-delta")
      .option("maxVersionsPerTrigger", 1)
      .load(src)
      .writeStream.format("memory").queryName("graft_throttle")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // everything arrives, but across ≥4 micro-batches (one version each)
      assert(spark.table("graft_throttle").count() == 4)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    } finally q.stop()
  }

  test("maxFilesPerTrigger admits whole commits up to the file budget") {
    val src = tempTable("fmt-filecap").toString
    val ckpt = tempTable("fmt-filecap-ckpt").toString
    // 4 commits × 2 files each
    (0 until 4).foreach { i =>
      (0 until 20).map(j => ((i * 20 + j).toLong, s"v$i")).toDF("id", "v")
        .repartition(2).write.format("graft-delta")
        .mode(if (i == 0) "errorifexists" else "append").save(src)
    }
    val q = spark.readStream.format("graft-delta")
      .option("maxFilesPerTrigger", 4) // = 2 commits per batch
      .load(src)
      .writeStream.format("memory").queryName("graft_filecap")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_filecap").count() == 80)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 2, s"expected ≥2 throttled batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows <= 40))
    } finally q.stop()
  }

  test("a single commit larger than maxBytesPerTrigger still advances") {
    val src = tempTable("fmt-bytecap").toString
    val ckpt = tempTable("fmt-bytecap-ckpt").toString
    (0 until 100).map(i => (i.toLong, "x" * 50)).toDF("id", "v")
      .write.format("graft-delta").save(src)
    val q = spark.readStream.format("graft-delta")
      .option("maxBytesPerTrigger", 1) // far below any file size
      .load(src)
      .writeStream.format("memory").queryName("graft_bytecap")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_bytecap").count() == 100)
    } finally q.stop()
  }

  test("startingVersion skips the backfill for a fresh query") {
    val src = tempTable("fmt-startver").toString
    val ckpt = tempTable("fmt-startver-ckpt").toString
    (0 until 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").write.format("graft-delta")
        .mode(if (i == 0) "errorifexists" else "append").save(src)
    }
    val q = spark.readStream.format("graft-delta")
      .option("startingVersion", 2)
      .load(src)
      .writeStream.format("memory").queryName("graft_startver")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // only version 2's rows; earlier versions never served
      assert(spark.table("graft_startver").as[(Long, String)].collect().toSeq ==
        Seq((2L, "v2")))
      Seq((9L, "v9")).toDF("id", "v").write.format("graft-delta").mode("append").save(src)
      q.processAllAvailable()
      assert(spark.table("graft_startver").count() == 2)
    } finally q.stop()
  }

  test("throttled restart after a committed batch does not re-serve versions") {
    // Regression (ADVICE r4): on restart the engine calls getOffset BEFORE
    // any getBatch; with rate limiting on, an anchor that reset to floor
    // produced an offset below the checkpointed one, the offset log
    // regressed, and later batches duplicated rows. The anchor is now
    // persisted under the source's checkpoint metadataPath.
    val src = tempTable("fmt-restart").toString
    val dst = tempTable("fmt-restart-dst").toString
    val ckpt = tempTable("fmt-restart-ckpt").toString
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").write.format("graft-delta")
        .mode(if (i == 0) "errorifexists" else "append").save(src)
    }
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("maxVersionsPerTrigger", 1)
        .load(src)
        .writeStream.format("graft-delta")
        .option("appId", "restart-anchor")
        .option("checkpointLocation", ckpt)
        .start(dst)
      try q.processAllAvailable() finally q.stop()
    }
    run() // first run drains versions 0..3, every batch committed
    assert(DeltaTable.forPath(spark, dst).toDF.count() == 4)
    (4 until 6).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").write.format("graft-delta")
        .mode("append").save(src)
    }
    // restart from the checkpoint: a regressed offset would re-serve old
    // versions under FRESH batch ids, which the sink's txn idempotence
    // cannot skip — duplicates would land in dst
    run()
    val rows = DeltaTable.forPath(spark, dst).toDF
      .as[(Long, String)].collect().toSeq.sorted
    assert(rows == (0 until 6).map(i => (i.toLong, s"v$i")),
      s"restart re-served already-committed versions: $rows")
  }

  test("readStream → transform → graft-delta sink: delta-to-delta streaming pipeline") {
    val src = tempTable("fmt-pipe-src").toString
    val dst = tempTable("fmt-pipe-dst").toString
    val ckpt = tempTable("fmt-pipe-ckpt").toString
    (1L to 10L).map(i => (i, i * 2)).toDF("id", "v").write.format("graft-delta").save(src)

    val q = spark.readStream.format("graft-delta").load(src)
      .filter(col("v") > 4)
      .writeStream.format("graft-delta")
      .option("appId", "pipe-1")
      .option("checkpointLocation", ckpt)
      .start(dst)
    try {
      q.processAllAvailable()
      assert(DeltaTable.forPath(spark, dst).toDF.count() == 8) // v in {6..20}
    } finally q.stop()
  }

  test("CDF soak: CoW UPDATE + MERGE + DV DELETE + RESTORE across two restarts folds to the source state") {
    // The composed end-to-end assertion the individual CDF specs don't
    // make: a delta→delta readChangeFeed pipeline, driven through every
    // DML shape with checkpoint restarts between them, must deliver a
    // change stream that FOLDS to the source's final state exactly once.
    val src = tempTable("cdf-soak-src").toString
    val dst = tempTable("cdf-soak-dst").toString
    val ckpt = tempTable("cdf-soak-ck").toString
    (0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(2)
      .write.format("graft-delta").save(src)
    DeltaTable.forPath(spark, src)
      .setProperties(Map(TableConfig.EnableChangeDataFeed -> "true"))

    def run(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-delta")
        .option("appId", "cdf-soak")
        .option("checkpointLocation", ckpt).start(dst)
      try q.processAllAvailable() finally q.stop()
    }

    run() // leg 1: backfill (40 inserts)
    Dml.update(spark, src, col("id") < 5,
      Map("v" -> org.apache.spark.sql.functions.lit("U"))) // CoW UPDATE
    val restorePoint = DeltaLog.forPath(spark, src).update().version
    Merge.into(spark, src, Seq((5L, "MU"), (6L, "MD"), (100L, "MI")).toDF("id", "v"),
        col("t.id") === col("s.id"))
      .whenMatchedUpdate(col("s.v") === "MU", Map("v" -> col("s.v")))
      .whenMatchedDelete(col("s.v") === "MD")
      .whenNotMatchedInsertAll()
      .execute() // MERGE: update + delete + insert
    run() // leg 2: restart recovers from the checkpoint
    DeltaTable.forPath(spark, src)
      .setProperties(Map(TableConfig.EnableDeletionVectors -> "true"))
    Dml.delete(spark, src, col("id") === 7L) // merge-on-read DELETE
    assert(DeltaTable.forPath(spark, src).files.exists(DeletionVectors.hasDv))
    DeltaTable.forPath(spark, src).restoreToVersion(restorePoint) // RESTORE
    run() // leg 3: second restart

    // fold the delivered feed: per version, removals before additions
    val changes = DeltaTable.forPath(spark, dst).toDF
      .select("id", "v", ChangeDataFeed.ChangeType, ChangeDataFeed.CommitVersion)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val folded = changes.groupBy(_._4).toSeq.sortBy(_._1)
      .foldLeft(Map.empty[Long, String]) { case (state, (_, vs)) =>
        val minus = vs.filter(c => c._3 == "delete" || c._3 == "update_preimage")
        val plus = vs.filter(c => c._3 == "insert" || c._3 == "update_postimage")
        val removed = state -- minus.map(_._1)
        removed ++ plus.map(c => c._1 -> c._2)
      }
    val srcState = DeltaTable.forPath(spark, src).toDF
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(folded == srcState,
      s"feed fold diverged from source: missing=${srcState.keySet -- folded.keySet} " +
      s"extra=${folded.keySet -- srcState.keySet}")
    // and the feed was exactly-once: every (version, change_type, id) unique
    assert(changes.distinct.length == changes.length, "replayed change rows")
  }

  test("modern-tier soak: streaming a table with ICT + v2 checkpoints + domains across restarts") {
    // the stream's offset tracking lists commit files; UUID-named v2
    // checkpoints, .crc checksums, and domain-only commits must all be
    // transparent to it, across checkpoint restarts
    val src = tempTable("modern-soak-src").toString
    val dst = tempTable("modern-soak-dst").toString
    val ckpt = tempTable("modern-soak-ck").toString
    (0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("graft-delta").save(src)
    DeltaTable.forPath(spark, src).setProperties(Map(
      TableConfig.EnableInCommitTimestamps -> "true",
      TableConfig.CheckpointPolicy -> "v2",
      TableConfig.CheckpointInterval -> "3")) // v2 checkpoints land mid-stream

    def run(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("ignoreDeletes", "true").load(src)
        .writeStream.format("graft-delta")
        .option("appId", "modern-soak")
        .option("checkpointLocation", ckpt).start(dst)
      try q.processAllAvailable() finally q.stop()
    }

    run() // leg 1: backfill
    DeltaTable.forPath(spark, src).setDomainMetadata("app.audit", "leg2")
    (20 until 30).foreach(i => GraftWriter.write(
      Seq((i.toLong, s"v$i")).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append)) // crosses cadence → v2 checkpoints
    run() // leg 2: restart over a log now containing UUID checkpoints
    DeltaTable.forPath(spark, src).setProperties(
      Map(TableConfig.EnableDeletionVectors -> "true"))
    Dml.delete(spark, src, col("id") === 3L) // DV delete (ignoreDeletes opted in)
    (30 until 33).foreach(i => GraftWriter.write(
      Seq((i.toLong, s"v$i")).toDF("id", "v"), src,
      org.apache.spark.sql.SaveMode.Append))
    run() // leg 3

    // append-stream semantics: every insert served exactly once (the DV
    // delete is invisible by the opt-in)
    val got = DeltaTable.forPath(spark, dst).toDF
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == (0 until 33).map(i => (i.toLong, s"v$i")))
    // and the source's log really did checkpoint as v2 with ICT clocks
    val log = DeltaLog.forPath(spark, src)
    assert(log.findLatestCheckpointForVersion(Long.MaxValue)
      .exists(_.v2FileName.isDefined))
    assert(log.inCommitTimestampOf(log.update().version).isDefined)
  }

  test("writeStream.format('graft-delta') is an exactly-once streaming sink") {
    val dir = tempTable("fmt-stream").toString
    val ckpt = tempTable("fmt-stream-ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = mem.toDF().withColumnRenamed("value", "id")
      .writeStream.format("graft-delta")
      .option("appId", "fmt-e2e")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(dir)
    mem.addData(1L to 40L: _*)
    q.awaitTermination(60000)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.as[Long].collect().sorted.toSeq == (1L to 40L))
    assert(dt.snapshot.appTransactionVersion.contains("fmt-e2e"))
  }
}
