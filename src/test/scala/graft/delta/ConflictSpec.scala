package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic conflict detection on the optimistic commit path — beyond the
  * reference's blind retry (its TODO at rust/src/delta.rs:1306-1322). */
class ConflictSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def mkTable(name: String, n: Int = 40): String = {
    val dir = tempTable(name).toString
    GraftWriter.write((0 until n).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(2), dir)
    dir
  }

  /** A transaction whose read snapshot predates `racer`'s commit. */
  private def staleTxn(dir: String)(racer: => Unit): OptimisticTransaction = {
    val log = DeltaLog.forPath(spark, dir)
    log.update()
    val txn = log.startTransaction()
    racer // lands a commit the txn has not seen
    txn
  }

  test("concurrent appends commute: both commit, no conflict") {
    val dir = mkTable("cf-append")
    val txn = staleTxn(dir) {
      GraftWriter.write(Seq((100L, "x")).toDF("id", "v"), dir, SaveMode.Append)
    }
    txn.addAction(AddAction(path = "extra.parquet", size = 1L,
      partitionValues = Map.empty, modificationTime = 0L, dataChange = true))
    val v = txn.commit()
    assert(v == 2) // append landed after the racer's version 1
  }

  test("delete racing delete of the same file aborts the loser") {
    val dir = mkTable("cf-delete-delete")
    val txn = staleTxn(dir) {
      Dml.delete(spark, dir, lit(true)) // racer removes every file
    }
    val victim = DeltaLog.forPath(spark, dir)
    // build remove actions against the ORIGINAL snapshot's files
    val original = victim.snapshotForVersion(0).files
    original.foreach(f => txn.addAction(RemoveAction(
      path = f.path, deletionTimestamp = 1L, dataChange = true)))
    intercept[ConcurrentDeleteDeleteException] { txn.commit() }
  }

  test("append racing a data-change rewrite aborts the rewrite") {
    val dir = mkTable("cf-append-vs-rewrite")
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val txn = log.startTransaction()
    // racer appends rows the rewrite never saw
    GraftWriter.write(Seq((200L, "late")).toDF("id", "v"), dir, SaveMode.Append)
    // rewrite: remove one original file (as DELETE would)
    txn.addAction(RemoveAction(path = snap.files.head.path,
      deletionTimestamp = 1L, dataChange = true))
    intercept[ConcurrentAppendException] { txn.commit() }
  }

  test("compaction (dataChange=false) commutes with a concurrent append") {
    val dir = mkTable("cf-optimize-append")
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val txn = log.startTransaction()
    GraftWriter.write(Seq((300L, "y")).toDF("id", "v"), dir, SaveMode.Append)
    // OPTIMIZE-shaped commit: remove originals + add compacted, dataChange=false
    snap.files.foreach(f => txn.addAction(RemoveAction(
      path = f.path, deletionTimestamp = 1L, dataChange = false)))
    txn.addAction(AddAction(path = "compacted.parquet", size = 1L,
      partitionValues = Map.empty, modificationTime = 0L, dataChange = false))
    val v = txn.commit() // no exception: compaction never blocks writers
    assert(v == 2)
    // the racer's append survived the compaction
    val live = DeltaLog.forPath(spark, dir).update().files.map(_.path)
    assert(live.contains("compacted.parquet"))
    assert(live.exists(p => !p.contains("compacted"))) // the appended file
  }

  test("disjoint racing DMLs on an UNPARTITIONED table abort conservatively") {
    // the racer's rewrite commits dataChange adds; with no partition
    // columns there is no read-domain projection, so the stale DELETE
    // aborts even though the two predicates touch disjoint files — the
    // safe call; the caller re-reads and retries the operation
    val dir = tempTable("cf-disjoint").toString
    GraftWriter.write((0 until 50).map(i => (i.toLong, s"n$i")).toDF("id", "v")
      .repartition(1), dir)
    GraftWriter.write((1000 until 1050).map(i => (i.toLong, s"n$i")).toDF("id", "v")
      .repartition(1), dir, SaveMode.Append)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val lowFile = snap.files.find(_.stats.exists(!_.contains("1000"))).get
    val txn = log.startTransaction()
    Dml.delete(spark, dir, col("id") >= 1000 && col("id") < 1010) // racer: high file only
    txn.addAction(RemoveAction(path = lowFile.path,
      deletionTimestamp = 1L, dataChange = true))
    intercept[ConcurrentCommitException] { txn.commit() }
  }

  private def mkPartTable(name: String): String = {
    val dir = tempTable(name).toString
    GraftWriter.write(
      (0 until 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "p")
        .repartition(4), // several files per partition dir
      dir, partitionBy = Seq("p"))
    dir
  }

  test("partition-disjoint racing DMLs both commit (read-domain scoping)") {
    val dir = mkPartTable("cf-part-disjoint")
    // racer: DELETE in partition b lands while our DELETE in partition a
    // holds a stale snapshot — its dataChange adds sit outside our domain
    val log = DeltaLog.forPath(spark, dir)
    log.update()
    Dml.delete(spark, dir, col("p") === "b" && col("id") < 10)
    // stale DELETE on partition a: both the detection scan and the commit
    // run against the pre-racer snapshot held by `log`
    val snap = log.snapshot
    val txn = log.startTransaction().withReadFilters(
      Seq(PartitionFilter.Eq("p", "a")))
    snap.files.filter(_.partitionValues.get("p").contains("a"))
      .foreach(f => txn.addAction(RemoveAction(
        path = f.path, deletionTimestamp = 1L, dataChange = true,
        partitionValues = Some(f.partitionValues))))
    val v = txn.commit() // no abort: the racer's adds are in partition b
    assert(v == 2)
  }

  test("same-partition append still aborts a partition-scoped rewrite") {
    val dir = mkPartTable("cf-part-same")
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val txn = log.startTransaction().withReadFilters(
      Seq(PartitionFilter.Eq("p", "a")))
    // racer appends INTO partition a — inside the rewrite's read domain
    GraftWriter.write(Seq((100L, "a")).toDF("id", "p"), dir,
      SaveMode.Append, partitionBy = Seq("p"))
    snap.files.filter(_.partitionValues.get("p").contains("a"))
      .foreach(f => txn.addAction(RemoveAction(
        path = f.path, deletionTimestamp = 1L, dataChange = true,
        partitionValues = Some(f.partitionValues))))
    intercept[ConcurrentAppendException] { txn.commit() }
  }

  test("Dml.delete extracts its read domain from the predicate end-to-end") {
    val dir = mkPartTable("cf-dml-e2e")
    // two full DML operations racing on disjoint partitions: the second
    // starts from a snapshot that predates the first's commit
    // uncached: the scenario IS a stale independent handle racing the DML —
    // the r17 shared-handle cache would advance logA with the racer's commit
    val logA = DeltaLog.forPathUncached(spark, dir)
    logA.update() // snapshot v0 pinned
    Dml.delete(spark, dir, col("p") === "b" && col("id") < 10) // racer wins v1
    // stale rewrite through the full Dml path would re-read; emulate the
    // stale read by committing through logA's pinned snapshot
    val snapA = logA.snapshot
    assert(snapA.version == 0)
    val txn = logA.startTransaction().withReadFilters(
      PartitionFilter.fromCatalyst(
        org.apache.spark.sql.graftbridge.ColumnBridge.catalystExpression(
          col("p") === "a" && col("id") < 10),
        Seq("p")))
    snapA.files.filter(_.partitionValues.get("p").contains("a")).take(1)
      .foreach(f => txn.addAction(RemoveAction(
        path = f.path, deletionTimestamp = 1L, dataChange = true,
        partitionValues = Some(f.partitionValues))))
    assert(txn.commit() == 2)
    // and a NON-partition predicate yields no filters -> conservative abort
    val logB = DeltaLog.forPath(spark, dir)
    logB.update()
    val txn2 = logB.startTransaction().withReadFilters(
      PartitionFilter.fromCatalyst(
        org.apache.spark.sql.graftbridge.ColumnBridge.catalystExpression(col("id") < 5),
        Seq("p")))
    // racer rewrites in partition b (keeps some rows, so it commits adds)
    Dml.delete(spark, dir, col("p") === "b" && col("id") < 25)
    val aFile = logB.snapshot.files.find(_.partitionValues.get("p").contains("a")).get
    txn2.addAction(RemoveAction(
      path = aFile.path, deletionTimestamp = 1L, dataChange = true,
      partitionValues = Some(aFile.partitionValues)))
    intercept[ConcurrentAppendException] { txn2.commit() }
  }

  test("fromCatalyst extracts Eq/Ne/In conjuncts, ignores OR and data columns") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{catalystExpression => ex}
    val pc = Seq("p", "q")
    assert(PartitionFilter.fromCatalyst(ex(col("p") === "a"), pc) ==
      Seq(PartitionFilter.Eq("p", "a")))
    assert(PartitionFilter.fromCatalyst(ex(lit(3) === col("q")), pc) ==
      Seq(PartitionFilter.Eq("q", "3")))
    assert(PartitionFilter.fromCatalyst(ex(col("p") =!= "a" && col("id") < 5), pc) ==
      Seq(PartitionFilter.Ne("p", "a")))
    assert(PartitionFilter.fromCatalyst(ex(col("p").isin("a", "b") && col("q") === "1"), pc)
      .toSet == Set(PartitionFilter.In("p", Set("a", "b")), PartitionFilter.Eq("q", "1")))
    // OR is not a necessary condition per-branch: nothing extracted
    assert(PartitionFilter.fromCatalyst(ex(col("p") === "a" || col("p") === "b"), pc).isEmpty)
    // data columns contribute nothing
    assert(PartitionFilter.fromCatalyst(ex(col("id") === 7), pc).isEmpty)
    // MERGE-style qualified refs bind only through the declared qualifier
    assert(PartitionFilter.fromCatalyst(ex(col("t.p") === "a" && col("s.p") === "zz"),
      Seq("p"), qualifier = Some("t")) == Seq(PartitionFilter.Eq("p", "a")))
  }

  test("typed date/timestamp/decimal literals yield NO filter (conservative)") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{catalystExpression => ex}
    val pc = Seq("p")
    // DateType literal's internal value is days-since-epoch — its toString
    // ("18628") never equals the Hive partition string ("2021-01-01"), so
    // emitting Eq("p","18628") would falsely prove disjointness. The safe
    // output is no filter at all.
    assert(PartitionFilter.fromCatalyst(
      ex(col("p") === lit(java.sql.Date.valueOf("2021-01-01"))), pc).isEmpty)
    assert(PartitionFilter.fromCatalyst(
      ex(col("p") === lit(java.sql.Timestamp.valueOf("2021-01-01 10:00:00"))), pc).isEmpty)
    assert(PartitionFilter.fromCatalyst(
      ex(col("p") === lit(BigDecimal("1.50"))), pc).isEmpty)
    assert(PartitionFilter.fromCatalyst(
      ex(col("p").isin(java.sql.Date.valueOf("2021-01-01"),
        java.sql.Date.valueOf("2021-01-02"))), pc).isEmpty)
    // string / integral / boolean literals still extract
    assert(PartitionFilter.fromCatalyst(ex(col("p") === lit(5L)), pc) ==
      Seq(PartitionFilter.Eq("p", "5")))
    assert(PartitionFilter.fromCatalyst(ex(col("p") === lit(true)), pc) ==
      Seq(PartitionFilter.Eq("p", "true")))
  }

  test("date-partitioned rewrite vs concurrent append aborts (no false disjointness)") {
    // Regression: before litStr was type-restricted, DELETE ... WHERE p =
    // DATE'2021-01-01' produced Eq("p","18628"), which matched no add's
    // partitionValues -> the racer's append was "proven" disjoint and the
    // stale rewrite committed, silently losing the conflict.
    val dir = tempTable("cf-date-part").toString
    val df = spark.sql(
      """SELECT id, CASE WHEN id % 2 = 0 THEN DATE'2021-01-01'
        |            ELSE DATE'2021-01-02' END AS p
        |FROM range(0, 40)""".stripMargin)
    GraftWriter.write(df.repartition(2), dir, partitionBy = Seq("p"))
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val txn = log.startTransaction().withReadFilters(
      PartitionFilter.fromCatalyst(
        org.apache.spark.sql.graftbridge.ColumnBridge.catalystExpression(
          col("p") === lit(java.sql.Date.valueOf("2021-01-01"))),
        Seq("p")))
    // racer appends INTO the same date partition the rewrite is reading
    GraftWriter.write(
      spark.sql("SELECT 100L AS id, DATE'2021-01-01' AS p"),
      dir, SaveMode.Append, partitionBy = Seq("p"))
    snap.files.filter(_.partitionValues.get("p").contains("2021-01-01")).take(1)
      .foreach(f => txn.addAction(RemoveAction(
        path = f.path, deletionTimestamp = 1L, dataChange = true,
        partitionValues = Some(f.partitionValues))))
    intercept[ConcurrentAppendException] { txn.commit() }
  }

  test("concurrent metadata change aborts any transaction") {
    val dir = mkTable("cf-meta")
    val txn = staleTxn(dir) {
      // racer rewrites the table metadata (schema evolution-style commit)
      val log2 = DeltaLog.forPath(spark, dir)
      log2.update()
      log2.startTransaction().addAction(MetaDataAction(
        id = java.util.UUID.randomUUID().toString, name = None, description = None,
        format = Format(), schemaString = DeltaSchema.toJson(
          new org.apache.spark.sql.types.StructType()
            .add("id", "long").add("v", "string").add("extra", "int")),
        partitionColumns = Nil, createdTime = Some(1L),
        configuration = Map.empty)).commit()
    }
    txn.addAction(AddAction(path = "mine.parquet", size = 1L,
      partitionValues = Map.empty, modificationTime = 0L, dataChange = true))
    intercept[MetadataChangedException] { txn.commit() }
  }

  test("DV delete racing OPTIMIZE of the same files aborts the loser") {
    val dir = mkTable("cf-dv-optimize")
    DeltaTable.forPath(spark, dir)
      .setProperties(Map(TableConfig.EnableDeletionVectors -> "true"))
    // stale compaction: reads the snapshot, then a DV delete re-points the
    // same files (remove+re-add) underneath it
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val txn = log.startTransaction()
    Dml.delete(spark, dir, col("id") < 5) // racer: DV remove+re-add
    snap.files.foreach(f => txn.addAction(RemoveAction(
      path = f.path, deletionTimestamp = 1L, dataChange = false)))
    intercept[ConcurrentDeleteDeleteException] { txn.commit() }
    // and a RETRIED compaction folds the racer's vectors in correctly
    val m = Optimize.compact(spark, dir, targetFileBytes = 1L)
    assert(m.filesRemoved > 0)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.count() == 35)
    assert(!dt.files.exists(DeletionVectors.hasDv), "compaction purges DVs")
  }
}
