package graft.delta

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.SparkTestBase
import org.apache.hadoop.fs.FileAlreadyExistsException
import org.scalatest.funsuite.AnyFunSuite

class TransactionSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures._

  test("single commit produces the next version with the buffered actions") {
    val dir = tempTable("commit1")
    writeCommit(dir, 0, Seq(protocol, metaData))
    val log = DeltaLog.forPath(spark, dir.toString)
    log.update()
    val v = log.startTransaction()
      .addAction(ActionCodec.fromJsonLine(add("f0.parquet")).get)
      .commit()
    assert(v == 1)
    val snap = log.update()
    assert(snap.version == 1 && snap.files.map(_.path) == Vector("f0.parquet"))
  }

  test("commit to an existing version fails with AlreadyExists (storage contract, storage/mod.rs:416-423)") {
    val dir = tempTable("conflict")
    writeCommit(dir, 0, Seq(protocol, metaData))
    val log = DeltaLog.forPath(spark, dir.toString)
    val txn = log.startTransaction().addAction(ActionCodec.fromJsonLine(add("x.parquet")).get)
    val tmp = txn.prepareCommit(Nil)
    intercept[FileAlreadyExistsException] {
      log.store.renameNoReplace(tmp, log.commitFile(0)) // v0 exists
    }
    // and the losing temp file is still there for a retry at v1
    log.store.renameNoReplace(tmp, log.commitFile(1))
    assert(log.update().version == 1)
  }

  test("retry loop lands on the next free version after a competitor commits") {
    val dir = tempTable("retry")
    writeCommit(dir, 0, Seq(protocol, metaData))
    val log1 = DeltaLog.forPath(spark, dir.toString)
    val log2 = DeltaLog.forPath(spark, dir.toString)
    log1.update(); log2.update()
    // competitor writes v1 out-of-band
    writeCommit(dir, 1, Seq(add("competitor.parquet")))
    val v = log1.startTransaction()
      .addAction(ActionCodec.fromJsonLine(add("mine.parquet")).get).commit()
    assert(v == 2)
    val files = log2.update().files.map(_.path).toSet
    assert(files == Set("competitor.parquet", "mine.parquet"))
  }

  test("5 workers x 3 commits: versions 1..15 exactly once (concurrent_writes_test.rs:33-76)") {
    val dir = tempTable("concurrent")
    writeCommit(dir, 0, Seq(protocol, metaData))
    val pool = Executors.newFixedThreadPool(5)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = (0 until 5).map { w =>
      Future {
        // each worker has its own client instance, like the reference test
        val log = DeltaLog.forPath(spark, dir.toString)
        (0 until 3).map { i =>
          log.startTransaction()
            .addAction(ActionCodec.fromJsonLine(add(s"w$w-c$i.parquet")).get)
            .commit()
        }
      }
    }
    val versions = Await.result(Future.sequence(futures), 120.seconds).flatten
    pool.shutdown()
    assert(versions.sorted == (1L to 15L))
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.version == 15)
    assert(snap.files.size == 15)
  }

  test("commitInfo is recorded in history") {
    val dir = tempTable("cinfo")
    writeCommit(dir, 0, Seq(protocol, metaData))
    val log = DeltaLog.forPath(spark, dir.toString)
    log.update()
    val info = ActionCodec.mapper.createObjectNode()
    info.put("operation", "TEST")
    log.startTransaction()
      .addAction(ActionCodec.fromJsonLine(add("f.parquet")).get)
      .commit(Some(CommitInfoAction(info)))
    val hist = DeltaTable.forPath(spark, dir.toString).history
    assert(hist.exists(n => n.get("operation") != null && n.get("operation").asText == "TEST"))
  }
}
