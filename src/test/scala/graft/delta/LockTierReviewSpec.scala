package graft.delta

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import java.util.UUID
import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Regression cases for the r12 review of the lock/rename/coordinated tier
  * (LockingRename, LogStore, CoordinatedCommits, and their DeltaLog /
  * OptimisticTransaction call sites). One test per fixed finding. */
class LockTierReviewSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures._

  private def hadoopStore(): HadoopLogStore =
    new HadoopLogStore(spark.sessionState.newHadoopConf())

  private def fastClient(backend: InMemoryLockBackend,
                         leaseSecs: Long = 1): DynamoStyleLockClient =
    new DynamoStyleLockClient(backend, LockOptions(
      leaseDurationSecs = leaseSecs,
      refreshPeriodMillis = 20,
      additionalTimeToWaitMillis = 100))

  private def seedExpired(backend: InMemoryLockBackend, data: Option[String],
                          leaseSecs: Long = 1): Unit =
    backend.seed(LockRecord(
      ownerName = "crashed",
      recordVersionNumber = UUID.randomUUID().toString,
      leaseDurationSecs = Some(leaseSecs),
      isReleased = false,
      data = data))

  // ---- finding: acquire cap ran 10001 attempts, not the documented 10000

  test("acquireLoop gives up after exactly MaxAcquireAttempts tries") {
    var calls = 0
    val never = new LockClient {
      override def tryAcquireLock(data: Option[String]): Option[LockItem] = {
        calls += 1; None
      }
      override def getLock(): Option[LockItem] = None
      override def updateData(lock: LockItem, data: Option[String]): LockItem =
        throw new UnsupportedOperationException
      override def releaseLock(lock: LockItem): Boolean = false
    }
    val ops = new LockingRename.StoreRenameOps(hadoopStore())
    val e = intercept[IllegalStateException] {
      LockingRename.rename(ops, never, new Path("/a"), new Path("/b"))
    }
    assert(e.getMessage.contains(s"${LockingRename.MaxAcquireAttempts}"))
    assert(calls == LockingRename.MaxAcquireAttempts)
  }

  // ---- finding: repair tolerated AlreadyExists without finishing the
  // crashed holder's delete half, orphaning its source file forever

  test("takeover repair of a copied-but-not-deleted rename removes the leftover source") {
    val dir = tempTable("locktier-orphan")
    val store = hadoopStore()
    val crashedSrc = new Path(dir.toString, "_commit_crashed.json.tmp")
    val crashedDst = new Path(dir.toString, "00000000000000000001.json")
    store.write(crashedSrc, """{"txn":{"appId":"w1","version":1}}""")
    store.write(crashedDst, """{"txn":{"appId":"w1","version":1}}""") // copy done, delete not
    val backend = new InMemoryLockBackend
    seedExpired(backend, Some(LockingRename.toJson(
      LockingRename.LockData(crashedSrc.toString, crashedDst.toString))))

    val mySrc = new Path(dir.toString, "_commit_me.json.tmp")
    val myDst = new Path(dir.toString, "00000000000000000002.json")
    store.write(mySrc, """{"txn":{"appId":"me","version":1}}""")
    LockingRename.rename(new LockingRename.StoreRenameOps(store),
      fastClient(backend), mySrc, myDst)

    assert(store.exists(crashedDst), "repaired destination intact")
    assert(!store.exists(crashedSrc), "crashed holder's source must be cleaned up")
    assert(store.exists(myDst) && !store.exists(mySrc))
    assert(backend.get().isEmpty, "lease released")
  }

  // ---- finding: absent/unparsable inherited lock data threw with the
  // lease HELD and the poison payload preserved — livelocking every taker

  test("takeover with unparsable inherited lock data skips repair and completes") {
    val dir = tempTable("locktier-poison")
    val store = hadoopStore()
    val backend = new InMemoryLockBackend
    seedExpired(backend, Some("this is not a rename record"))
    val src = new Path(dir.toString, "_commit_me.json.tmp")
    val dst = new Path(dir.toString, "00000000000000000001.json")
    store.write(src, "{}")
    LockingRename.rename(new LockingRename.StoreRenameOps(store),
      fastClient(backend), src, dst)
    assert(store.exists(dst) && !store.exists(src))
    assert(backend.get().isEmpty, "lease released, poison record gone")
  }

  test("takeover with absent inherited lock data skips repair and completes") {
    val dir = tempTable("locktier-nodata")
    val store = hadoopStore()
    val backend = new InMemoryLockBackend
    seedExpired(backend, None)
    val src = new Path(dir.toString, "_commit_me.json.tmp")
    val dst = new Path(dir.toString, "00000000000000000001.json")
    store.write(src, "{}")
    LockingRename.rename(new LockingRename.StoreRenameOps(store),
      fastClient(backend), src, dst)
    assert(store.exists(dst) && !store.exists(src))
    assert(backend.get().isEmpty)
  }

  // ---- finding: no lease renewal during the copy — a rename slower than
  // the lease silently lost mutual exclusion mid-copy

  test("heartbeat keeps a slow rename's lease alive against a waiting taker") {
    val dir = tempTable("locktier-heartbeat")
    val store = hadoopStore()
    val backend = new InMemoryLockBackend
    val slowOps = new LockingRename.UnsafeRenameOps {
      private val inner = new LockingRename.StoreRenameOps(store)
      override def unsafeRename(src: Path, dst: Path): Unit = {
        Thread.sleep(2500) // ≫ the 1 s lease; heartbeat must carry it
        inner.unsafeRename(src, dst)
      }
      override def deleteIfExists(p: Path): Unit = inner.deleteIfExists(p)
    }
    val src = new Path(dir.toString, "_commit_slow.json.tmp")
    val dst = new Path(dir.toString, "00000000000000000001.json")
    store.write(src, "{}")

    @volatile var renameFailed: Option[Throwable] = None
    val t = new Thread(() => {
      try LockingRename.rename(slowOps, fastClient(backend), src, dst)
      catch { case e: Throwable => renameFailed = Some(e) }
    })
    t.start()
    Thread.sleep(300) // let the slow holder acquire and enter its copy
    // a contender sights the record, outwaits the lease, and must FAIL to
    // take over because the heartbeat keeps minting fresh RVNs
    val thief = fastClient(backend).tryAcquireLock(Some("thief"))
    assert(thief.isEmpty, "lease must not be stealable while the copy runs")
    t.join(10000)
    assert(renameFailed.isEmpty, s"slow rename should succeed: $renameFailed")
    assert(store.exists(dst) && !store.exists(src))
    assert(backend.get().isEmpty, "holder released its own (still-valid) lease")
  }

  // ---- finding: a DURABLY completed rename whose lease was stolen anyway
  // threw, which would double-apply the commit one version later

  test("a completed rename with a stolen lease returns success, not an error") {
    val dir = tempTable("locktier-stolen")
    val store = hadoopStore()
    val item = LockItem("me", "rvn-1", Some(20L), isReleased = false,
      data = None, lookupTimeMillis = System.currentTimeMillis(),
      acquiredExpiredLock = false)
    val stolenClient = new LockClient {
      override def tryAcquireLock(data: Option[String]): Option[LockItem] = Some(item)
      override def getLock(): Option[LockItem] = Some(item)
      override def updateData(lock: LockItem, data: Option[String]): LockItem =
        throw new LockStolenException("me")
      override def releaseLock(lock: LockItem): Boolean = false // stolen
    }
    val src = new Path(dir.toString, "_commit_me.json.tmp")
    val dst = new Path(dir.toString, "00000000000000000001.json")
    store.write(src, "{}")
    // must NOT throw: the rename durably landed
    LockingRename.rename(new LockingRename.StoreRenameOps(store),
      stolenClient, src, dst)
    assert(store.exists(dst) && !store.exists(src))
  }

  // ---- finding: StoreRenameOps buffered whole files on the heap; the
  // streaming LogStore.copy must stay byte-exact for binary payloads

  test("HadoopLogStore.copy streams binary content byte-exactly") {
    val dir = tempTable("locktier-copy")
    val store = hadoopStore()
    val bytes = Array.tabulate[Byte](1 << 20)(i => (i * 31 + 7).toByte)
    val src = new Path(dir.toString, "blob.bin")
    val dst = new Path(dir.toString, "blob-copy.bin")
    store.writeBytes(src, bytes)
    store.copy(src, dst)
    assert(java.util.Arrays.equals(store.readBytes(dst), bytes))
  }

  // ---- finding: backfill leaked its _backfill_<uuid>.json tmp on any
  // rename failure other than AlreadyExists

  test("backfill reclaims its tmp file when the rename fails hard") {
    spark.conf.set(DeltaLog.LogStoreFactoryKey, classOf[FailingRenameFactory].getName)
    try {
      val dir = tempTable("failrename-backfill")
      writeCommit(dir, 0, Seq(protocol, metaData))
      CommitCoordinatorProvider.register("im-bftmp", new InMemoryCommitCoordinator(100))
      DeltaTable.forPath(spark, dir.toString).enableCoordinatedCommits("im-bftmp")
      val log = DeltaLog.forPath(spark, dir.toString)
      log.update()
      log.startTransaction()
        .addAction(ActionCodec.fromJsonLine(add("a.parquet")).get).commit() // v2, staged only
      FailingRenameFactory.failFromVersion = 2
      try {
        val Some((client, tconf)) = CoordinatedCommits.clientForRead(log.update())
        val e = intercept[RuntimeException] {
          CoordinatedCommits.backfill(log, client, tconf)
        }
        assert(e.getMessage.contains("injected"))
      } finally FailingRenameFactory.failFromVersion = Long.MaxValue
      val leftovers = Files.list(dir.resolve("_delta_log")).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("_backfill_")).toSeq
      assert(leftovers.isEmpty, s"backfill tmp leaked: $leftovers")
    } finally spark.conf.unset(DeltaLog.LogStoreFactoryKey)
  }

  // ---- finding: retention could delete the ONLY copy of a staged-only
  // commit once a checkpoint covered it (backfillInterval > 1)

  test("retention never reclaims staged files whose classic twin is absent") {
    val dir = tempTable("locktier-retention")
    writeCommit(dir, 0, Seq(protocol, metaData))
    CommitCoordinatorProvider.register("im-ret", new InMemoryCommitCoordinator(100))
    DeltaTable.forPath(spark, dir.toString).enableCoordinatedCommits("im-ret")
    val log = DeltaLog.forPath(spark, dir.toString)
    log.update()
    def commitAdd(f: String): Long =
      log.startTransaction().addAction(ActionCodec.fromJsonLine(add(f)).get).commit()
    assert(commitAdd("a.parquet") == 2 && commitAdd("b.parquet") == 3) // staged only
    log.update()
    log.checkpoint() // covers the staged-only tail (v3)
    val stagedDir = dir.resolve("_delta_log").resolve("_commits")
    def staged(): Seq[String] = Files.list(stagedDir).iterator().asScala
      .map(_.getFileName.toString).filterNot(_.startsWith(".")).toSeq.sorted

    // everything is "old enough" (cutoff in the future) — yet staged-only
    // versions must survive because no classic twin exists
    val deleted1 = log.cleanUpExpiredLogs(3, retentionMillis = -60000)
    assert(!deleted1.exists(_.startsWith("_commits/")),
      s"staged-only commits were reclaimed: $deleted1")
    assert(staged().size == 2)
    // a cold coordinator-aware read still sees both commits
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.version == 3 &&
      snap.files.map(_.path).toSet == Set("a.parquet", "b.parquet"))

    // after backfill the classic twins exist → v2's staged file is
    // reclaimable (v3 == checkpointVersion stays by the < rule)
    val Some((client, tconf)) = CoordinatedCommits.clientForRead(snap)
    CoordinatedCommits.backfill(log, client, tconf)
    val deleted2 = log.cleanUpExpiredLogs(3, retentionMillis = -60000)
    assert(deleted2.exists(_.startsWith(s"_commits/${DeltaLog.pad20(2)}")),
      s"backfilled staged file should be reclaimed: $deleted2")
    assert(DeltaLog.forPath(spark, dir.toString).update().files.size == 2)
  }

  test("aged _backfill_ tmp leftovers are retention-swept") {
    val dir = tempTable("locktier-tmpsweep")
    writeCommit(dir, 0, Seq(protocol, metaData, add("f0.parquet")))
    val logDir = dir.resolve("_delta_log")
    val tmp = logDir.resolve("_backfill_deadbeef-1234.json")
    Files.writeString(tmp, "{}")
    Files.setLastModifiedTime(tmp,
      FileTime.fromMillis(System.currentTimeMillis() - 100000))
    val live = logDir.resolve("_backfill_cafe-5678.json")
    Files.writeString(live, "{}") // fresh: must survive
    val log = DeltaLog.forPath(spark, dir.toString)
    val deleted = log.cleanUpExpiredLogs(0, retentionMillis = 50000)
    assert(deleted.contains("_backfill_deadbeef-1234.json"))
    assert(!Files.exists(tmp))
    assert(Files.exists(live), "fresh tmp (an in-flight backfill) must survive")
  }

  test("aged .copytmp leftovers are swept in _delta_log AND _commits (r12)") {
    // the atomic-copy publish stages `.<name>.<uuid>.copytmp`; a crash
    // mid-stream leaves it — in the log root (lease renames) or under
    // _commits/ (coordinated proposal staging)
    val dir = tempTable("locktier-copytmp")
    writeCommit(dir, 0, Seq(protocol, metaData, add("f0.parquet")))
    val logDir = dir.resolve("_delta_log")
    val commits = logDir.resolve("_commits")
    Files.createDirectories(commits)
    val old = System.currentTimeMillis() - 100000
    val rootTmp = logDir.resolve(".00000000000000000001.json.abcd.copytmp")
    val cTmp = commits.resolve(".00000000000000000002.uuid.json.efgh.copytmp")
    Files.writeString(rootTmp, "{}"); Files.writeString(cTmp, "{}")
    Files.setLastModifiedTime(rootTmp, FileTime.fromMillis(old))
    Files.setLastModifiedTime(cTmp, FileTime.fromMillis(old))
    val fresh = commits.resolve(".00000000000000000003.uuid.json.ijkl.copytmp")
    Files.writeString(fresh, "{}") // in-flight: must survive
    val log = DeltaLog.forPath(spark, dir.toString)
    val deleted = log.cleanUpExpiredLogs(0, retentionMillis = 50000)
    assert(!Files.exists(rootTmp), s"root copytmp must be swept: $deleted")
    assert(!Files.exists(cTmp), s"_commits copytmp must be swept: $deleted")
    assert(Files.exists(fresh), "fresh copytmp (in-flight publish) must survive")
  }

  // ---- finding: a coordinator lagging the filesystem (enablement crash
  // window, fresh in-memory coordinator) rejected every proposal forever

  test("a writer self-heals a coordinator that lags the filesystem") {
    val dir = tempTable("locktier-heal")
    writeCommit(dir, 0, Seq(protocol, metaData))
    val coord = new InMemoryCommitCoordinator()
    CommitCoordinatorProvider.register("im-heal", coord)
    DeltaTable.forPath(spark, dir.toString).enableCoordinatedCommits("im-heal")
    val log = DeltaLog.forPath(spark, dir.toString)
    log.update()
    assert(log.startTransaction()
      .addAction(ActionCodec.fromJsonLine(add("a.parquet")).get).commit() == 2)
    // simulate the enablement crash window: a restarted coordinator whose
    // recovered seed is behind the filesystem's latest (registerTable is
    // monotonic now, so a live instance can't be walked backwards — the
    // lag state only arises from a fresh/restored coordinator)
    val lagging = new InMemoryCommitCoordinator()
    lagging.registerTable(log.logPath.toString, 0)
    CommitCoordinatorProvider.register("im-heal", lagging)
    val v = log.startTransaction()
      .addAction(ActionCodec.fromJsonLine(add("b.parquet")).get).commit()
    assert(v == 3, "commit must succeed after self-heal re-seed")
    assert(DeltaLog.forPath(spark, dir.toString).update()
      .files.map(_.path).toSet == Set("a.parquet", "b.parquet"))
  }

  test("a fresh (state-lost) coordinator is re-seeded from the backfilled log") {
    val dir = tempTable("locktier-fresh")
    writeCommit(dir, 0, Seq(protocol, metaData))
    CommitCoordinatorProvider.register("im-fresh", new InMemoryCommitCoordinator())
    DeltaTable.forPath(spark, dir.toString).enableCoordinatedCommits("im-fresh")
    val log = DeltaLog.forPath(spark, dir.toString)
    log.update()
    assert(log.startTransaction()
      .addAction(ActionCodec.fromJsonLine(add("a.parquet")).get).commit() == 2)
    // "process restart": the in-memory coordinator loses all state
    CommitCoordinatorProvider.register("im-fresh", new InMemoryCommitCoordinator())
    val fresh = DeltaLog.forPath(spark, dir.toString)
    fresh.update()
    val v = fresh.startTransaction()
      .addAction(ActionCodec.fromJsonLine(add("b.parquet")).get).commit()
    assert(v == 3, "writes must recover against a recovered coordinator")
    assert(DeltaLog.forPath(spark, dir.toString).update()
      .files.map(_.path).toSet == Set("a.parquet", "b.parquet"))
  }
}
