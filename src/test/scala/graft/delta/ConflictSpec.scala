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

  test("disjoint racing DMLs abort conservatively (no predicate tracking)") {
    // the racer's rewrite commits dataChange adds, so the stale DELETE
    // aborts even though the two predicates touch disjoint files — without
    // read-predicate tracking this is the safe call; the caller re-reads
    // and retries the operation
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
}
