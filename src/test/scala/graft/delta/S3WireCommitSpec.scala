package graft.delta

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The ENGINE's commit path over the wire-level S3 store (r16 verdict #8,
  * one level above the conformance matrix): `DeltaLog.forPath("s3://…")`
  * routed through [[S3HttpLogStoreFactory]] against a live moto endpoint —
  * version discovery by ListObjectsV2, commits by SigV4-signed PUT +
  * lease-serialized copy+delete rename, conflict classification through
  * the same retry loop as local stores. Log-layer only: table DATA files
  * ride Spark's Hadoop FS (hadoop-aws — absent here), so the commits are
  * metadata/TxnAction commits, which exercise every log primitive the
  * protocol needs (list, read, putIfAbsent-shaped rename, `_last_…`
  * overwrite classes are conformance rows). */
class S3WireCommitSpec extends AnyFunSuite with SparkTestBase
    with BeforeAndAfterAll {

  private val port = {
    val ss = new java.net.ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }
  private val bucket = "graft-commits"
  private var moto: Process = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    moto = new ProcessBuilder("moto_server", "-H", "127.0.0.1",
        "-p", port.toString)
      .redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.to(
        new java.io.File(s"/tmp/moto-commits-$port.log")))
      .start()
    val deadline = System.currentTimeMillis() + 30000
    var up = false
    while (!up && System.currentTimeMillis() < deadline) {
      try {
        new S3HttpLogStore(s"http://127.0.0.1:$port", "us-east-1",
          "graft-test-key", "graft-test-secret").createBucket(bucket)
        up = true
      } catch { case _: Exception => Thread.sleep(200) }
    }
    require(up, s"moto_server did not come up on port $port in 30s")
    // the factory's PRODUCTION lock path: a DynamoDB lock table, spoken
    // wire-level — the commit race below serializes through REAL
    // conditional PutItem, not the in-memory stand-in
    new DynamoDbHttpLockBackend(s"http://127.0.0.1:$port", "us-east-1",
      "graft-test-key", "graft-test-secret", "graft-locks", "bootstrap")
      .createTable()
  }

  override def afterAll(): Unit = {
    if (moto != null) moto.destroy()
    super.afterAll()
  }

  private def withS3Conf[A](body: => A): A = {
    val keys = Map(
      DeltaLog.LogStoreFactoryKey -> "graft.delta.S3HttpLogStoreFactory",
      "spark.graft.s3.endpoint" -> s"http://127.0.0.1:$port",
      "spark.graft.s3.region" -> "us-east-1",
      "spark.graft.s3.accessKey" -> "graft-test-key",
      "spark.graft.s3.secretKey" -> "graft-test-secret",
      "spark.graft.s3.lockTableName" -> "graft-locks",
      "spark.graft.dynamodb.endpoint" -> s"http://127.0.0.1:$port")
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally keys.keys.foreach(spark.conf.unset)
  }

  test("commits land, serialize, and replay over the wire store") {
    withS3Conf {
      val table = s"s3://$bucket/tables/t-${java.util.UUID.randomUUID()}"
      val log = DeltaLog.forPath(spark, table)
      assert(log.update().version == -1L, "fresh table starts at -1")
      // version 0: protocol + metadata (what a create commit carries)
      val txn0 = log.startTransaction()
      txn0.addAction(ProtocolAction(1, 2))
      txn0.addAction(MetaDataAction(
        java.util.UUID.randomUUID().toString, None, None, Format(),
        """{"type":"struct","fields":[]}""", Nil, None, Map.empty))
      txn0.addAction(TxnAction("wire", 0L))
      assert(txn0.commit() == 0L)
      // a few more app-version commits — each one list-discovers the tail,
      // SigV4-PUTs a temp name, and lease-renames into NNN.json
      (1L to 5L).foreach { v =>
        val txn = log.startTransaction()
        txn.addAction(TxnAction("wire", v))
        assert(txn.commit() == v)
      }
      val snap = log.update()
      assert(snap.version == 5L)
      assert(snap.appTransactionVersion.get("wire").contains(5L))
      // a SECOND handle (fresh DeltaLog — separate cache) replays the
      // whole log from the wire store alone
      val log2 = DeltaLog.forPath(spark, table)
      val snap2 = log2.update()
      assert(snap2.version == 5L &&
        snap2.appTransactionVersion.get("wire").contains(5L),
        "an independent reader must replay the wire log identically")

      // CONCURRENT committers: the lease + retry loop must serialize —
      // every commit lands at a distinct version, none lost
      val n = 4
      val pool = Executors.newFixedThreadPool(n)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val fs = (0 until n).map { i =>
        Future {
          val l = DeltaLog.forPath(spark, table)
          l.update()
          val txn = l.startTransaction()
          txn.addAction(TxnAction(s"writer-$i", 1L))
          txn.commit()
        }
      }
      val versions = Await.result(Future.sequence(fs), 120.seconds)
      pool.shutdown()
      assert(versions.toSet.size == n,
        s"concurrent commits must land at distinct versions: $versions")
      assert(versions.max == 5L + n)
      val fin = DeltaLog.forPath(spark, table).update()
      (0 until n).foreach(i => assert(
        fin.appTransactionVersion.get(s"writer-$i").contains(1L),
        s"writer-$i's commit must survive the race"))
    }
  }

  test("the raw store refuses unsafe rename; the factory-wrapped path is what commits") {
    val raw = new S3HttpLogStore(s"http://127.0.0.1:$port", "us-east-1",
      "graft-test-key", "graft-test-secret")
    raw.write(new org.apache.hadoop.fs.Path(s"s3://$bucket/fence/src"), "x")
    val e = intercept[IllegalStateException] {
      raw.renameNoReplace(
        new org.apache.hadoop.fs.Path(s"s3://$bucket/fence/src"),
        new org.apache.hadoop.fs.Path(s"s3://$bucket/fence/dst"))
    }
    assert(e.getMessage.contains("ObjectStoreLogStore"))
  }
}
