package graft.delta

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The [[LogStore]] CONTRACT as an executable conformance suite (r12
  * verdict #7): every requirement the engine's correctness arguments lean
  * on — create-new rename atomicity class, list-after-put visibility,
  * byte-exactness, atomic copy visibility — stated once and run against
  * every implementation. A future cloud connector (S3/GCS/Azure) must pass
  * this suite before `DeltaLog.forPath` may route a scheme to it; the
  * documented per-scheme contract matrix (BASELINE.md round-8/12 reviews)
  * is the prose form of these tests.
  *
  * Matrix rows:
  *  1. read-after-write: a completed write/writeBytes is immediately
  *     readable AND immediately visible to list() (graft discovers commits
  *     by listing — an eventually-consistent LIST breaks `update()`).
  *  2. byte-exactness: writeBytes/readBytes round-trip arbitrary binary
  *     (checkpoint parquet is not UTF-8); write/read round-trip UTF-8 text
  *     including non-ASCII.
  *  3. overwrite: write and writeBytes replace existing content
  *     (`_last_checkpoint` convention); copy overwrites its destination.
  *  4. renameNoReplace: exactly-once create-new semantics — moves src to
  *     dst; raises Hadoop FileAlreadyExistsException (the type
  *     OptimisticTransaction's retry loop catches) when dst exists, and
  *     the conflict MUST NOT destroy dst's content or (on the same-store
  *     conflict path) corrupt src before the caller reclaims it.
  *  5. rename race: N concurrent renames of DISTINCT sources to ONE dst →
  *     exactly one winner, every loser sees FileAlreadyExistsException,
  *     dst holds exactly the winner's bytes.
  *  6. copy atomic visibility: a concurrent reader polling the destination
  *     of an in-flight copy sees complete-or-absent, never a torn prefix
  *     (the r12 storm find: torn commit reads stamp wrong checksums).
  *  7. list: missing dir → empty (not an error); results sorted by name;
  *     direct children only.
  *  8. delete/exists/fileStatus/mkdirs basics.
  */
abstract class LogStoreConformance extends AnyFunSuite {

  /** A fresh store handle. Handles returned by separate calls must behave
    * like separate writer processes over the SAME namespace (fresh lock
    * client identity, etc.). */
  def newStore(): LogStore
  def storeName: String

  private lazy val root =
    Files.createTempDirectory(s"logstore-conformance-$storeName").toFile
  /** Namespace root the matrix runs under — file: by default; a cloud
    * store overrides with its own URI (e.g. `s3://bucket/run-uuid`). */
  protected def rootUri: String = s"file:${root.getAbsolutePath}"
  private def p(name: String) = new Path(s"$rootUri/$name")

  test(s"[$storeName] read-after-write and list-after-put") {
    val s = newStore()
    s.mkdirs(p("d1"))
    s.write(p("d1/a.json"), """{"k":"v-ü-€"}""")
    assert(s.exists(p("d1/a.json")))
    assert(s.read(p("d1/a.json")) == """{"k":"v-ü-€"}""")
    val listed = s.list(p("d1")).map(_.getPath.getName)
    assert(listed.contains("a.json"), s"list-after-put must see the file: $listed")
    s.writeBytes(p("d1/b.bin"), Array[Byte](0, -1, -128, 127, 10, 13))
    assert(s.list(p("d1")).map(_.getPath.getName).contains("b.bin"))
  }

  test(s"[$storeName] byte-exact binary round-trip (non-UTF8 payload)") {
    val s = newStore()
    s.mkdirs(p("d2"))
    val payload = Array.tabulate[Byte](4096)(i => ((i * 31 + 7) % 256 - 128).toByte)
    s.writeBytes(p("d2/ckpt.parquet"), payload)
    assert(java.util.Arrays.equals(s.readBytes(p("d2/ckpt.parquet")), payload))
  }

  test(s"[$storeName] write and copy overwrite existing content") {
    val s = newStore()
    s.mkdirs(p("d3"))
    s.write(p("d3/last"), "v1")
    s.write(p("d3/last"), "v2")
    assert(s.read(p("d3/last")) == "v2")
    s.write(p("d3/src"), "fresh")
    s.copy(p("d3/src"), p("d3/last"))
    assert(s.read(p("d3/last")) == "fresh")
    assert(s.read(p("d3/src")) == "fresh", "copy must not consume its source")
  }

  test(s"[$storeName] renameNoReplace: moves, and conflicts raise FileAlreadyExists preserving dst") {
    val s = newStore()
    s.mkdirs(p("d4"))
    s.write(p("d4/src1"), "one")
    s.renameNoReplace(p("d4/src1"), p("d4/commit.json"))
    assert(!s.exists(p("d4/src1")), "rename must consume the source")
    assert(s.read(p("d4/commit.json")) == "one")
    s.write(p("d4/src2"), "two")
    intercept[FileAlreadyExistsException] {
      s.renameNoReplace(p("d4/src2"), p("d4/commit.json"))
    }
    assert(s.read(p("d4/commit.json")) == "one",
      "a conflicting rename must not clobber the landed commit")
    assert(s.exists(p("d4/src2")),
      "the loser's source survives for the caller to reclaim")
  }

  test(s"[$storeName] rename race: exactly one winner per destination") {
    val s = newStore()
    s.mkdirs(p("d5"))
    val n = 6
    val stores = (0 until n).map(_ => newStore())
    (0 until n).foreach(i => s.write(p(s"d5/src-$i"), s"writer-$i"))
    val pool = Executors.newFixedThreadPool(n)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val gate = new CountDownLatch(1)
    val fs = (0 until n).map { i =>
      Future {
        gate.await()
        try { stores(i).renameNoReplace(p(s"d5/src-$i"), p("d5/v.json")); Right(i) }
        catch { case e: FileAlreadyExistsException => Left(i) }
      }
    }
    gate.countDown()
    val results = Await.result(Future.sequence(fs), 120.seconds)
    pool.shutdown()
    val winners = results.collect { case Right(i) => i }
    assert(winners.size == 1, s"exactly one rename must win: $results")
    assert(s.read(p("d5/v.json")) == s"writer-${winners.head}",
      "destination must hold exactly the winner's bytes")
    results.collect { case Left(i) => i }.foreach { i =>
      assert(s.exists(p(s"d5/src-$i")), s"loser $i's source must survive")
    }
  }

  test(s"[$storeName] copy publishes complete-or-absent (no torn reads)") {
    val s = newStore()
    s.mkdirs(p("d6"))
    val big = Array.tabulate[Byte](2 * 1024 * 1024)(i => (i % 251).toByte)
    s.writeBytes(p("d6/src"), big)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    (1 to 10).foreach { round =>
      val dst = p(s"d6/dst-$round")
      @volatile var stop = false
      val reader = Future {
        var torn: Option[Int] = None
        while (!stop && torn.isEmpty) {
          if (s.exists(dst)) {
            val got = try Some(s.readBytes(dst)) catch { case _: Exception => None }
            got.foreach { b => if (b.length != big.length) torn = Some(b.length) }
          }
        }
        torn
      }
      s.copy(p("d6/src"), dst)
      stop = true
      val torn = Await.result(reader, 60.seconds)
      assert(torn.isEmpty, s"round $round: reader observed a torn copy of $torn bytes")
      assert(java.util.Arrays.equals(s.readBytes(dst), big))
    }
    pool.shutdown()
  }

  test(s"[$storeName] list: missing dir empty, sorted, direct children only") {
    val s = newStore()
    assert(s.list(p("no-such-dir")).isEmpty)
    s.mkdirs(p("d7/sub"))
    s.write(p("d7/b.json"), "b"); s.write(p("d7/a.json"), "a")
    s.write(p("d7/sub/nested.json"), "n")
    val names = s.list(p("d7")).map(_.getPath.getName)
    assert(names == names.sorted, s"list must sort by name: $names")
    assert(names.contains("a.json") && names.contains("b.json"))
    assert(!names.contains("nested.json"), "list is non-recursive")
  }

  test(s"[$storeName] delete / exists / fileStatus / mkdirs basics") {
    val s = newStore()
    s.mkdirs(p("d8"))
    s.mkdirs(p("d8")) // idempotent
    s.write(p("d8/x"), "x")
    assert(s.fileStatus(p("d8/x")).getLen == 1)
    intercept[Exception] { s.fileStatus(p("d8/missing")) }
    s.delete(p("d8/x"))
    assert(!s.exists(p("d8/x")))
    s.delete(p("d8/x")) // deleting a missing path is not an error
  }
}

/** The local / HDFS-class store: native create-new rename. */
class HadoopLogStoreConformanceSpec extends LogStoreConformance {
  override def storeName = "hadoop"
  override def newStore(): LogStore = new HadoopLogStore(new Configuration())
}

/** The S3-class store: copy+delete rename under the distributed lease.
  * Each newStore() is a fresh writer identity over one shared lock
  * backend, exactly the production wiring ([[ObjectStoreSeamFixture]]). */
class ObjectStoreLogStoreConformanceSpec extends LogStoreConformance {
  private val backend = new InMemoryLockBackend
  override def storeName = "objectstore"
  override def newStore(): LogStore =
    new ObjectStoreLogStore(new HadoopLogStore(new Configuration()),
      new DynamoStyleLockClient(backend, LockOptions(
        leaseDurationSecs = 2,
        refreshPeriodMillis = 20,
        additionalTimeToWaitMillis = 20)))
}

/** The WIRE-LEVEL S3 store against a LIVE endpoint (r16 verdict #8): a
  * local moto S3 server (the AWS-API emulator shipped in this
  * environment's driver tooling) is spawned for the suite, and the full
  * contract matrix runs over real HTTP — SigV4-signed PUT/GET/HEAD/
  * DELETE/ListObjectsV2/CopyObject — through the SAME
  * [[ObjectStoreLogStore]]+lease wrapper as the production factory
  * ([[S3HttpLogStoreFactory]]). Each newStore() is a fresh writer
  * identity over one shared lock backend, per the abstract contract.
  * What stays environment-bound: endpoint-side SigV4 signature
  * VALIDATION (moto parses but does not verify signatures) and table
  * DATA files (Spark's parquet I/O needs the hadoop-aws jar). */
class S3HttpLogStoreConformanceSpec extends LogStoreConformance
    with org.scalatest.BeforeAndAfterAll {
  private val port = {
    val ss = new java.net.ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }
  private val bucket = "graft-conformance"
  private var moto: Process = _

  private def rawStore() =
    new S3HttpLogStore(s"http://127.0.0.1:$port", "us-east-1",
      "graft-test-key", "graft-test-secret")

  override def beforeAll(): Unit = {
    moto = new ProcessBuilder("moto_server", "-H", "127.0.0.1",
        "-p", port.toString)
      .redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.to(
        new java.io.File(s"/tmp/moto-conformance-$port.log")))
      .start()
    // readiness: the first successful HTTP round-trip
    val deadline = System.currentTimeMillis() + 30000
    var up = false
    while (!up && System.currentTimeMillis() < deadline) {
      try {
        rawStore().createBucket(bucket)
        up = true
      } catch { case _: Exception => Thread.sleep(200) }
    }
    require(up, s"moto_server did not come up on port $port in 30s")
  }

  override def afterAll(): Unit = if (moto != null) moto.destroy()

  private val backend = new InMemoryLockBackend
  override def storeName = "s3-wire-moto"
  override protected lazy val rootUri: String =
    s"s3://$bucket/run-${java.util.UUID.randomUUID()}"
  override def newStore(): LogStore =
    new ObjectStoreLogStore(rawStore(),
      new DynamoStyleLockClient(backend, LockOptions(
        leaseDurationSecs = 2,
        refreshPeriodMillis = 20,
        additionalTimeToWaitMillis = 20)))
}

/** BOTH halves of the reference's S3 architecture over the wire at once:
  * data through [[S3HttpLogStore]] AND the lease through
  * [[DynamoDbHttpLockBackend]] (conditional PutItem/DeleteItem against
  * moto's DynamoDB), so the rename-race row exercises the REAL
  * conditional-write serialization, not the in-memory stand-in. */
class S3DynamoWireConformanceSpec extends LogStoreConformance
    with org.scalatest.BeforeAndAfterAll {
  private val port = {
    val ss = new java.net.ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }
  private val bucket = "graft-conformance-dyn"
  private var moto: Process = _

  private def endpoint = s"http://127.0.0.1:$port"
  private def rawStore() =
    new S3HttpLogStore(endpoint, "us-east-1",
      "graft-test-key", "graft-test-secret")
  private lazy val lockTable = {
    val b = new DynamoDbHttpLockBackend(endpoint, "us-east-1",
      "graft-test-key", "graft-test-secret", "graft-locks", "conformance")
    b.createTable()
    b
  }

  override def beforeAll(): Unit = {
    moto = new ProcessBuilder("moto_server", "-H", "127.0.0.1",
        "-p", port.toString)
      .redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.to(
        new java.io.File(s"/tmp/moto-dyn-conformance-$port.log")))
      .start()
    val deadline = System.currentTimeMillis() + 30000
    var up = false
    while (!up && System.currentTimeMillis() < deadline) {
      try {
        rawStore().createBucket(bucket)
        up = true
      } catch { case _: Exception => Thread.sleep(200) }
    }
    require(up, s"moto_server did not come up on port $port in 30s")
    lockTable // create the lock table before any rename needs it
  }

  override def afterAll(): Unit = if (moto != null) moto.destroy()

  override def storeName = "s3+dynamo-wire"
  override protected lazy val rootUri: String =
    s"s3://$bucket/run-${java.util.UUID.randomUUID()}"
  override def newStore(): LogStore =
    new ObjectStoreLogStore(rawStore(),
      new DynamoStyleLockClient(lockTable, LockOptions(
        leaseDurationSecs = 2,
        refreshPeriodMillis = 20,
        additionalTimeToWaitMillis = 20)))
}
