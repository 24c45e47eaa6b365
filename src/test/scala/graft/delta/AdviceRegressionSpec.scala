package graft.delta

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the round-9 advisor findings — each test encodes one
  * reported failure scenario. */
class AdviceRegressionSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  /** Overwrite behind Hadoop's LocalFileSystem + drop its `.name.crc`
    * integrity sidecar (stale sidecar ⇒ the new content reads as missing). */
  private def overwriteBehindHadoop(dir: String, name: String, content: String): Unit = {
    Files.writeString(Paths.get(dir, "_delta_log", name), content)
    Files.deleteIfExists(Paths.get(dir, "_delta_log", s".$name.crc"))
  }

  test("a snapshot that fails checksum validation is never cached — the retry re-validates") {
    val dir = tempTable("adv-crc-retry").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    overwriteBehindHadoop(dir, f"${0L}%020d.crc",
      """{"tableSizeBytes":1,"numFiles":42,"numMetadata":1,"numProtocol":1}""")
    val log = DeltaLog.forPathUncached(spark, dir) // fresh instance, nothing cached
    intercept[IllegalStateException](log.update())
    assert(log.snapshot.version < 0,
      "the failed snapshot must not have been cached")
    // before the fix: the first failure cached the snapshot, so the retry
    // saw no new commits, skipped validation, and served it silently
    val e2 = intercept[IllegalStateException](log.update())
    assert(e2.getMessage.contains("checksum mismatch"))
  }

  test("json v2 manifest INLINE adds survive the distributed restore path") {
    val dir = tempTable("adv-v2-json-dist").toString
    GraftWriter.write((0 until 30).map(i => (i.toLong, "j")).toDF("id", "v")
      .repartition(3), dir)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    // foreign-written JSON manifest carrying the file actions INLINE
    val lines =
      Seq(s"""{"checkpointMetadata":{"version":${snap.version}}}""",
        ActionCodec.toJsonLine(ProtocolAction(3, 7,
          Some(Set("v2Checkpoint")), Some(Set("v2Checkpoint")))),
        ActionCodec.toJsonLine(snap.metadata.get)) ++
      snap.files.map(ActionCodec.toJsonLine)
    val name = f"${snap.version}%020d.checkpoint.feedface-0000-4000-8000-000000000009.json"
    Files.writeString(Paths.get(dir, "_delta_log", name), lines.mkString("\n"))
    Files.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      s"""{"version":${snap.version},"size":${lines.size}}""")
    spark.conf.set(DeltaLog.DistributedThresholdKey, "1")
    try {
      val cold = DeltaLog.forPath(spark, dir).update()
      assert(cold.files.map(_.path).sorted == snap.files.map(_.path).sorted,
        "inline adds of a JSON v2 manifest were dropped on the distributed path")
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 30)
    } finally spark.conf.unset(DeltaLog.DistributedThresholdKey)
  }

  test("vacuum fences on the WRITER protocol before reclaiming files") {
    val dir = tempTable("adv-vacuum-fence").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    // a future writer feature may redefine file liveness; vacuum must not
    // irreversibly delete under it even though the rows READ fine
    LogFixtures.writeCommit(Paths.get(dir), 1,
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["someFutureFeature"]}}"""))
    val e = intercept[UnsupportedProtocolException] {
      DeltaTable.forPath(spark, dir).vacuum(dryRun = true)
    }
    assert(e.getMessage.contains("someFutureFeature"))
  }

  test("evolve + identity generation commits exactly ONE metaData action") {
    val dir = tempTable("adv-single-md").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      IdentityColumns.field("rid", 1, 1),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    GraftWriter.write(spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema), dir)
    // the append evolves the schema (new column `extra`) AND generates
    // identity values (frame omits `rid`) — one commit, one metaData
    val v = GraftWriter.write(Seq(("a", 7L), ("b", 8L)).toDF("v", "extra"),
      dir, SaveMode.Append, mergeSchema = true)
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(Paths.get(dir, "_delta_log", f"$v%020d.json"))).asScala
    val mdLines = lines.filter(_.contains("\"metaData\""))
    assert(mdLines.size == 1,
      s"commit $v carries ${mdLines.size} metaData actions (spec allows 1)")
    // the single action carries BOTH the evolved column and the advanced mark
    assert(mdLines.head.contains("extra"), "evolved column missing from the folded metaData")
    assert(mdLines.head.contains(IdentityColumns.HighWaterMarkKey),
      "identity high-water mark missing from the folded metaData")
    val s = DeltaLog.forPath(spark, dir).update()
    val ids = DeltaTable.forPath(spark, dir).toDF.select("rid").as[Long].collect()
    assert(ids.distinct.length == 2)
    assert(s.schema.fieldNames.contains("extra"))
  }

  test("compaction handles variant and map columns (salt never hashes row content)") {
    // xxhash64 rejects MapType and VariantType; a content-derived salt
    // made compact() throw on such schemas — the provenance salt must not
    val dir = tempTable("adv-salt-variant").toString
    val df = (0 until 400).map(i => (i.toLong, "p1", s"""{"k":$i}"""))
      .toDF("id", "part", "j")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("part"),
        org.apache.spark.sql.functions.parse_json(
          org.apache.spark.sql.functions.col("j")).as("payload"),
        org.apache.spark.sql.functions.map(
          org.apache.spark.sql.functions.lit("a"),
          org.apache.spark.sql.functions.col("id")).as("m"))
    GraftWriter.write(df.repartition(4), dir, partitionBy = Seq("part"))
    val m = Optimize.compact(spark, dir)
    assert(m.filesRemoved == 4 && m.filesAdded >= 1)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 400)
  }

  test("compaction salt is deterministic AND splits duplicate-heavy partitions") {
    // provenance salt (source file + row index): deterministic under task
    // retry — unlike rand() — and unique per row, so even a partition of
    // IDENTICAL rows (which a content hash collapses into one bucket)
    // still splits to the byte target
    val dir = tempTable("adv-salt").toString
    GraftWriter.write((0 until 4000).map(_ => (7L, "p1", "x" * 100))
      .toDF("id", "part", "pad").repartition(8), dir, partitionBy = Seq("part"))
    val bytes = DeltaLog.forPath(spark, dir).update().files.map(_.size).sum
    val m = Optimize.compact(spark, dir, targetFileBytes = bytes / 4)
    assert(m.filesAdded >= 3,
      s"identical-row partition collapsed to ${m.filesAdded} file(s)")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 4000)
    // the salt is a pure function of scan provenance: no nondeterministic
    // expression may appear anywhere in the compaction plan (the rand()
    // regression this guards against)
    assert(m.filesRemoved == 8)
  }

  test("r15: requireAppVersion binds to the txn's OWN read snapshot — a mark advanced after an early check still refuses") {
    val dir = tempTable("adv-r15-appver").toString
    val app = "graft.test.maintainer"
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir,
      extraActions = Seq(TxnAction(app, 10L)))
    val log = DeltaLog.forPath(spark, dir)
    log.update()
    // maintainer M1 pins its transaction while the mark is at 10 (the
    // r15-advice shape: an early caller-side check passed, then a long
    // staging job ran, and the txn was only started afterwards)
    val txn1 = log.startTransaction().requireAppVersion(app, 10L)
    // a competing maintainer lands the same window first, advancing the mark
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append,
      extraActions = Seq(TxnAction(app, 11L)),
      requireAppVersion = Some((app, 10L)))
    // M1's commit must CONFLICT on the same-appId TxnAction instead of
    // double-applying the window and regressing nothing
    txn1.addAction(TxnAction(app, 11L))
    intercept[ConcurrentTransactionException](txn1.commit())
    // a fresh transaction sees the advanced mark in its own read snapshot
    log.update()
    intercept[StaleAppVersionException] {
      log.startTransaction().requireAppVersion(app, 10L)
    }
    // a guarded txn WITHOUT its same-appId TxnAction refuses at commit —
    // the conflict-rule leg of the guarantee would be unarmed
    log.update()
    val txn3 = log.startTransaction().requireAppVersion(app, 11L)
    val e = intercept[IllegalArgumentException](txn3.commit())
    assert(e.getMessage.contains("same-appId TxnAction"))
    // exactly one advance landed
    assert(log.update().appTransactionVersion.get(app).contains(11L))
  }
}
