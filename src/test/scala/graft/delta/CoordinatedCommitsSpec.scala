package graft.delta

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Coordinated commits ([[CoordinatedCommits]]): commit-via-coordinator,
  * staged files under `_delta_log/_commits/`, backfill to classic names,
  * merge-on-read of the staged tail, the enable/disable lifecycle, and a
  * randomized commit/backfill safety model. */
class CoordinatedCommitsSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures._

  private def registered(name: String, interval: Int): String = {
    CommitCoordinatorProvider.register(name,
      new InMemoryCommitCoordinator(backfillInterval = interval))
    name
  }

  private def fsJson(dir: java.nio.file.Path, v: Long): java.nio.file.Path =
    dir.resolve("_delta_log").resolve(f"$v%020d.json")

  private def stagedFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val d = dir.resolve("_delta_log").resolve("_commits")
    if (Files.isDirectory(d))
      Files.list(d).iterator().asScala.toSeq
        .filterNot(_.getFileName.toString.startsWith(".")) // Hadoop .crc sidecars
        .sortBy(_.getFileName.toString)
    else Nil
  }

  private def append(dir: java.nio.file.Path, file: String): Long = {
    val log = DeltaLog.forPath(spark, dir.toString)
    log.startTransaction()
      .addAction(ActionCodec.fromJsonLine(add(file)).get).commit()
  }

  test("enable → coordinated append stages under _commits and backfills at interval 1") {
    val dir = tempTable("cc-basic")
    writeCommit(dir, 0, Seq(protocol, metaData))
    val t = DeltaTable.forPath(spark, dir.toString)
    val enableV = t.enableCoordinatedCommits("in-memory")
    assert(enableV == 1)
    // the enablement commit is filesystem-routed and declares the feature
    assert(Files.exists(fsJson(dir, 1)))
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.writerFeatures.exists(_.contains(CoordinatedCommits.Feature)))
    val v = append(dir, "c0.parquet")
    assert(v == 2)
    // staged AND backfilled (interval 1), byte-identical
    val staged = stagedFiles(dir)
    assert(staged.size == 1 &&
      staged.head.getFileName.toString.startsWith(f"${2L}%020d."))
    assert(Files.exists(fsJson(dir, 2)))
    assert(Files.readString(staged.head) == Files.readString(fsJson(dir, 2)))
    val files = DeltaLog.forPath(spark, dir.toString).update().files.map(_.path)
    assert(files == Vector("c0.parquet"))
  }

  test("staged-only commits are visible to coordinator-aware readers before backfill") {
    val dir = tempTable("cc-staged-vis")
    writeCommit(dir, 0, Seq(protocol, metaData))
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits(registered("im-i3", 3))
    assert(append(dir, "a.parquet") == 2)      // 2 % 3 != 0 → staged only
    assert(!Files.exists(fsJson(dir, 2)), "v2 must not be backfilled yet")
    // a FRESH log (cold read) merges the coordinator tail over the listing
    val cold = DeltaLog.forPath(spark, dir.toString).update()
    assert(cold.version == 2 && cold.files.map(_.path) == Vector("a.parquet"))
    assert(append(dir, "b.parquet") == 3)      // 3 % 3 == 0 → backfills 2..3
    assert(Files.exists(fsJson(dir, 2)) && Files.exists(fsJson(dir, 3)))
    assert(append(dir, "c.parquet") == 4)      // staged only again
    assert(!Files.exists(fsJson(dir, 4)))
    val cold2 = DeltaLog.forPath(spark, dir.toString).update()
    assert(cold2.version == 4 &&
      cold2.files.map(_.path).toSet == Set("a.parquet", "b.parquet", "c.parquet"))
    // feature-unaware view (fs only) is stale but consistent at v3
    assert(DeltaLog.forPath(spark, dir.toString).snapshotForVersion(3)
      .files.map(_.path).toSet == Set("a.parquet", "b.parquet"))
  }

  test("a table naming an unregistered coordinator reads (stale view) but refuses writes") {
    val dir = tempTable("cc-foreign")
    val md = s"""{"metaData":{"id":"11111111-2222-3333-4444-666666666666","format":{"provider":"parquet","options":{}},"schemaString":"$schemaString","partitionColumns":[],"configuration":{"${CoordinatedCommits.CoordinatorNameKey}":"no-such-coordinator"},"createdTime":1587968585000}}"""
    val proto = s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["${CoordinatedCommits.Feature}"]}}"""
    writeCommit(dir, 0, Seq(proto, md, add("f0.parquet")))
    val log = DeltaLog.forPath(spark, dir.toString)
    val snap = log.update() // read OK: writer feature, backfilled view legal
    assert(snap.version == 0 && snap.files.map(_.path) == Vector("f0.parquet"))
    val e = intercept[UnsupportedProtocolException] {
      log.startTransaction()
        .addAction(ActionCodec.fromJsonLine(add("x.parquet")).get).commit()
    }
    assert(e.getMessage.contains("no-such-coordinator"))
  }

  test("3 writers x 5 commits race through one coordinator: contiguous versions, every add lands") {
    val dir = tempTable("cc-storm")
    writeCommit(dir, 0, Seq(protocol, metaData))
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits(registered("im-storm", 2))
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val fs = (0 until 3).map { w =>
      Future {
        val log = DeltaLog.forPath(spark, dir.toString)
        log.update()
        (0 until 5).map { i =>
          log.startTransaction()
            .addAction(ActionCodec.fromJsonLine(add(s"w$w-$i.parquet")).get)
            .commit()
        }
      }
    }
    val versions = Await.result(Future.sequence(fs), 120.seconds).flatten
    pool.shutdown()
    // versions 2..16 claimed exactly once
    assert(versions.sorted == (2L to 16L))
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.version == 16)
    assert(snap.files.map(_.path).toSet ==
      (for (w <- 0 until 3; i <- 0 until 5) yield s"w$w-$i.parquet").toSet)
    // finish the backfill and check fs bytes == staged bytes for every version
    val log = DeltaLog.forPath(spark, dir.toString)
    val Some((client, tconf)) = CoordinatedCommits.clientForRead(log.update())
    CoordinatedCommits.backfill(log, client, tconf)
    (2L to 16L).foreach { v =>
      assert(Files.exists(fsJson(dir, v)), s"v$v not backfilled")
      val staged = stagedFiles(dir).find(_.getFileName.toString.startsWith(f"$v%020d."))
      staged.foreach(s =>
        assert(Files.readString(s) == Files.readString(fsJson(dir, v))))
    }
    // coordinator no longer tracks anything
    assert(client.getCommits(log.logPath.toString, tconf)._1.isEmpty)
  }

  test("disablement commits through the coordinator and leaves the log fully backfilled") {
    val dir = tempTable("cc-disable")
    writeCommit(dir, 0, Seq(protocol, metaData))
    val t = DeltaTable.forPath(spark, dir.toString)
    t.enableCoordinatedCommits(registered("im-i100", 100))
    append(dir, "a.parquet"); append(dir, "b.parquet") // staged only (interval 100)
    assert(!Files.exists(fsJson(dir, 2)) && !Files.exists(fsJson(dir, 3)))
    val dv = DeltaTable.forPath(spark, dir.toString).disableCoordinatedCommits()
    assert(dv == 4)
    // the disable commit force-backfilled EVERYTHING including itself
    (2L to 4L).foreach(v => assert(Files.exists(fsJson(dir, v)), s"v$v missing"))
    // the next commit is rename-routed: no new staged file appears
    val stagedBefore = stagedFiles(dir).size
    assert(append(dir, "after.parquet") == 5)
    assert(Files.exists(fsJson(dir, 5)) && stagedFiles(dir).size == stagedBefore)
    val files = DeltaLog.forPath(spark, dir.toString).update().files.map(_.path).toSet
    assert(files == Set("a.parquet", "b.parquet", "after.parquet"))
  }

  test("backfill is idempotent across a crash between copy and register") {
    val dir = tempTable("cc-crash")
    writeCommit(dir, 0, Seq(protocol, metaData))
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits(registered("im-crash", 100))
    append(dir, "a.parquet"); append(dir, "b.parquet")
    // simulate a backfiller that copied v2 then died before registerBackfill
    val v2staged = stagedFiles(dir)
      .find(_.getFileName.toString.startsWith(f"${2L}%020d.")).get
    Files.copy(v2staged, fsJson(dir, 2))
    val log = DeltaLog.forPath(spark, dir.toString)
    val Some((client, tconf)) = CoordinatedCommits.clientForRead(log.update())
    CoordinatedCommits.backfill(log, client, tconf) // must skip v2, copy v3
    assert(Files.exists(fsJson(dir, 3)))
    assert(Files.readString(fsJson(dir, 2)) == Files.readString(v2staged))
    assert(client.getCommits(log.logPath.toString, tconf)._1.isEmpty)
    assert(DeltaLog.forPath(spark, dir.toString).update().files.size == 2)
  }

  test("randomized model: concurrent commits + racing backfills keep history linear") {
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val dir = tempTable(s"cc-model-$seed")
      writeCommit(dir, 0, Seq(protocol, metaData))
      val interval = Seq(1, 2, 5)(rnd.nextInt(3))
      DeltaTable.forPath(spark, dir.toString)
        .enableCoordinatedCommits(registered(s"im-model-$seed", interval))
      val writers = 2 + rnd.nextInt(2)
      val perWriter = 3
      val pool = Executors.newFixedThreadPool(writers + 1)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val commitFs = (0 until writers).map { w =>
        Future {
          val log = DeltaLog.forPath(spark, dir.toString)
          log.update()
          (0 until perWriter).map { i =>
            log.startTransaction()
              .addAction(ActionCodec.fromJsonLine(add(s"s$seed-w$w-$i.parquet")).get)
              .commit()
          }
        }
      }
      // a backfiller races the writers the whole time
      val backfiller = Future {
        val log = DeltaLog.forPath(spark, dir.toString)
        (0 until 5).foreach { _ =>
          CoordinatedCommits.clientForRead(log.update()).foreach {
            case (c, tc) => CoordinatedCommits.backfill(log, c, tc)
          }
        }
      }
      val versions =
        Await.result(Future.sequence(commitFs), 120.seconds).flatten.sorted
      Await.result(backfiller, 120.seconds)
      pool.shutdown()
      val n = writers * perWriter
      assert(versions == (2L to (1L + n)),
        s"seed $seed: versions not contiguous/unique: $versions")
      val snap = DeltaLog.forPath(spark, dir.toString).update()
      assert(snap.version == 1L + n)
      assert(snap.files.size == n, s"seed $seed: lost adds")
      // every backfilled file is byte-identical to its staged source
      stagedFiles(dir).foreach { s =>
        val v = s.getFileName.toString.take(20).toLong
        val fs = fsJson(dir, v)
        if (Files.exists(fs))
          assert(Files.readString(fs) == Files.readString(s),
            s"seed $seed: v$v backfill diverged from staged bytes")
      }
    }
  }

  test("warm handle with state-lost coordinator backfills its staged map before re-seeding (r12)") {
    // latestVersion() merges the handle's own staged map, so the lag
    // branch must heal those versions to classic names before
    // registerTable — a bare re-seed at the map-inclusive tip would leave
    // them staged-only forever (the new coordinator never tracked them)
    val dir = tempTable("cc-warm-loss")
    writeCommit(dir, 0, Seq(protocol, metaData))
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits(registered("im-warm", 100))
    val log = DeltaLog.forPath(spark, dir.toString)
    log.update()
    def appendVia(f: String): Long = log.startTransaction()
      .addAction(ActionCodec.fromJsonLine(add(f)).get).commit()
    assert(appendVia("a.parquet") == 2 && appendVia("b.parquet") == 3)
    assert(!Files.exists(fsJson(dir, 2)) && !Files.exists(fsJson(dir, 3)))
    CommitCoordinatorProvider.register("im-warm",
      new InMemoryCommitCoordinator(backfillInterval = 100)) // state loss
    assert(appendVia("c.parquet") == 4)
    (2L to 3L).foreach(v => assert(Files.exists(fsJson(dir, v)),
      s"warm handle must heal its own staged v$v to classic before re-seeding"))
    val fresh = DeltaLog.forPath(spark, dir.toString).update()
    assert(fresh.files.map(_.path).toSet ==
      Set("a.parquet", "b.parquet", "c.parquet"))
  }

  test("a proposal adopted mid-commit by a recovering writer is success, not a retry (r12)") {
    // Race shape: writer W stages its proposal; a state-loss recovery
    // adopts that single staged candidate as the version's winner and
    // re-seeds the coordinator; W's claim then conflicts. W must detect
    // the classic copy is byte-identical to its own staged file and
    // report SUCCESS — a blind retry would apply the same actions twice.
    val dir = tempTable("cc-adopt-race")
    writeCommit(dir, 0, Seq(protocol, metaData))
    val inner = new InMemoryCommitCoordinator(backfillInterval = 100)
    val logForAdopt = () => DeltaLog.forPath(spark, dir.toString)
    CommitCoordinatorProvider.register("im-adopt", new CommitCoordinatorClient {
      @volatile var armed = false
      override def backfillInterval: Int = inner.backfillInterval
      override def registerTable(p: String, v: Long): Map[String, String] = {
        armed = true // arm after enablement registration
        inner.registerTable(p, v)
      }
      override def getCommits(p: String, tc: Map[String, String],
                              sv: Option[Long]): (Seq[CoordinatedCommit], Long) =
        inner.getCommits(p, tc, sv)
      override def registerBackfill(p: String, t: Long): Unit =
        inner.registerBackfill(p, t)
      override def commit(p: String, tc: Map[String, String],
                          c: CoordinatedCommit): Unit = {
        if (armed && c.version == 2) {
          armed = false
          // the recovery races in: adopts W's staged file, re-seeds
          val log = logForAdopt()
          log.claimClassic(
            new org.apache.hadoop.fs.Path(
              CoordinatedCommits.commitsDir(log.logPath), c.fileName),
            log.commitFile(c.version))
          inner.registerTable(p, c.version)
        }
        inner.commit(p, tc, c) // now a version conflict for W
      }
    })
    DeltaTable.forPath(spark, dir.toString).enableCoordinatedCommits("im-adopt")
    val v = append(dir, "a.parquet")
    assert(v == 2, s"adopted proposal must report its own version, got $v")
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.version == 2, "no duplicate commit may follow the adopted one")
    assert(snap.files.map(_.path) == Vector("a.parquet"),
      "the actions must be applied exactly once")
  }

  test("randomized model: coordinator state loss never forks or loses acked commits (r12)") {
    // sequential schedule of {commit, state-loss, backfill, fresh-read}
    // events: every acked commit must survive any number of coordinator
    // state losses, history must stay contiguous, and a fresh reader must
    // always see a version-PREFIX of the acked sequence (stale-but-
    // consistent is legal; forks and holes are not)
    (1 to 15).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val dir = tempTable(s"cc-loss-$seed")
      writeCommit(dir, 0, Seq(protocol, metaData))
      val interval = Seq(1, 2, 5, 100)(rnd.nextInt(4))
      val name = s"im-loss-$seed"
      DeltaTable.forPath(spark, dir.toString)
        .enableCoordinatedCommits(registered(name, interval))
      val acked = scala.collection.mutable.TreeMap[Long, String]() // version → file
      var n = 0
      (0 until 14).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 | 1 => // commit (weighted: the interesting events need commits between them)
            val f = s"f$n.parquet"; n += 1
            val v = append(dir, f)
            assert(!acked.contains(v), s"seed $seed: version $v forked")
            acked(v) = f
          case 2 => // coordinator loses all state
            CommitCoordinatorProvider.register(name,
              new InMemoryCommitCoordinator(backfillInterval = interval))
          case 3 => // racing backfill attempt (no-op on a lost coordinator)
            val log = DeltaLog.forPath(spark, dir.toString)
            CoordinatedCommits.clientForRead(log.update()).foreach {
              case (c, tc) => CoordinatedCommits.backfill(log, c, tc)
            }
        }
        // a fresh reader sees a version-prefix of acked history
        val snap = DeltaLog.forPath(spark, dir.toString).update()
        val visible = snap.files.map(_.path).toSet
        val prefix = acked.takeWhile(_._1 <= snap.version).values.toSet
        assert(visible == prefix,
          s"seed $seed: reader at v${snap.version} saw $visible, acked prefix $prefix")
      }
      // one final commit forces adoption of any stranded tail, then the
      // full acked history must be visible and contiguous
      val f = s"f$n.parquet"
      val v = append(dir, f)
      acked(v) = f
      assert(acked.keys.toSeq == (2L to acked.keys.max),
        s"seed $seed: acked versions not contiguous: ${acked.keys}")
      val snap = DeltaLog.forPath(spark, dir.toString).update()
      assert(snap.version == acked.keys.max)
      assert(snap.files.map(_.path).toSet == acked.values.toSet,
        s"seed $seed: acked commits lost after state losses")
    }
  }

  test("time travel and timestamps resolve staged-only versions") {
    val dir = tempTable("cc-tt")
    writeCommit(dir, 0, Seq(protocol, metaData))
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits(registered("im-tt", 100))
    append(dir, "a.parquet")
    append(dir, "b.parquet")
    val log = DeltaLog.forPath(spark, dir.toString)
    log.update()
    // pinned load of a staged-only version replays through the staged file
    assert(log.snapshotForVersion(2).files.map(_.path) == Vector("a.parquet"))
    assert(log.versionTimestamp(3) > 0)
  }

  test("state-lost coordinator: acked staged-only commits are adopted, not forked (r12)") {
    // the coordinator acked v2,v3 (staged-only, interval 100) and then
    // lost its state. The bare re-seed at fsLatest=1 would hand v2 to the
    // next commit and overwrite acked history; adoption must claim the
    // single staged candidates first, then commit beyond them.
    val dir = tempTable("cc-lost")
    writeCommit(dir, 0, Seq(protocol, metaData))
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits(registered("im-lost", 100))
    append(dir, "a.parquet"); append(dir, "b.parquet") // v2, v3 staged only
    assert(!Files.exists(fsJson(dir, 2)) && !Files.exists(fsJson(dir, 3)))
    // state loss: a fresh coordinator instance under the same name
    CommitCoordinatorProvider.register("im-lost",
      new InMemoryCommitCoordinator(backfillInterval = 100))
    assert(append(dir, "c.parquet") == 4,
      "next commit must land AFTER the adopted acked tail, not on v2")
    (2L to 3L).foreach(v =>
      assert(Files.exists(fsJson(dir, v)), s"acked v$v must be adopted to classic"))
    val files = DeltaLog.forPath(spark, dir.toString).update().files.map(_.path).toSet
    assert(files == Set("a.parquet", "b.parquet", "c.parquet"),
      "every acked add must survive coordinator state loss")
  }

  test("state-lost coordinator with ambiguous staged candidates refuses loudly (r12)") {
    val dir = tempTable("cc-lost-ambig")
    writeCommit(dir, 0, Seq(protocol, metaData))
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits(registered("im-lost2", 100))
    append(dir, "a.parquet") // v2 staged only
    // a second staged candidate for v2 with different content (a crashed
    // proposal from a racing writer): the winner is unknowable once the
    // coordinator is gone
    val real = stagedFiles(dir).head
    val fake = real.getParent.resolve(
      f"${2L}%020d.${java.util.UUID.randomUUID()}.json")
    Files.writeString(fake, Files.readString(real).replace("a.parquet", "z.parquet"))
    CommitCoordinatorProvider.register("im-lost2",
      new InMemoryCommitCoordinator(backfillInterval = 100))
    // the scenario is a FRESH PROCESS after total coordinator state loss:
    // a warm handle (r17 forPath cache) still tracks the real winner in its
    // staged map and would heal it instead of facing the ambiguity
    DeltaLog.clearHandleCache()
    val e = intercept[IllegalStateException] { append(dir, "c.parquet") }
    assert(e.getMessage.contains("staged candidates"),
      s"must refuse to pick a winner, got: ${e.getMessage}")
    assert(!Files.exists(fsJson(dir, 2)), "no candidate may be silently promoted")
  }

  test("disablement backfill failure: durable commit reported, gap healed (r12)") {
    // After the coordinator accepts the disablement commit, a backfill
    // failure must NOT surface as a failed write (the caller would retry
    // and double-apply) — and the staged-but-never-backfilled versions
    // must be claimed by the next filesystem-mode writer, or the classic
    // log keeps a permanent gap no future writer would ever fill (every
    // writer from here on sees "not coordinated" and renames past it).
    spark.conf.set(DeltaLog.LogStoreFactoryKey, classOf[FailingRenameFactory].getName)
    try {
      val dir = tempTable("failrename-disable")
      writeCommit(dir, 0, Seq(protocol, metaData))
      DeltaTable.forPath(spark, dir.toString)
        .enableCoordinatedCommits(registered("im-disfail", 100))
      append(dir, "a.parquet"); append(dir, "b.parquet") // v2, v3 staged only
      assert(!Files.exists(fsJson(dir, 2)) && !Files.exists(fsJson(dir, 3)))
      // every backfill rename now fails — the disablement commit itself is
      // durable at the coordinator before backfill starts
      FailingRenameFactory.failFromVersion = 2
      val dv =
        try DeltaTable.forPath(spark, dir.toString).disableCoordinatedCommits()
        finally FailingRenameFactory.failFromVersion = Long.MaxValue
      assert(dv == 4, "disablement must report success: the commit is durable")
      assert(!Files.exists(fsJson(dir, 4)), "backfill was injected to fail")
      // next writer is filesystem-routed; it must heal v2..v4 before
      // claiming v5 — a fresh log (new process) must heal identically
      assert(append(dir, "after.parquet") == 5)
      (2L to 5L).foreach(v =>
        assert(Files.exists(fsJson(dir, v)), s"classic v$v missing: gap"))
      // a coordinator-less foreign-style read (classic files only) sees
      // the full history
      val files = DeltaLog.forPath(spark, dir.toString).update().files.map(_.path).toSet
      assert(files == Set("a.parquet", "b.parquet", "after.parquet"))
    } finally spark.conf.unset(DeltaLog.LogStoreFactoryKey)
  }

  test("fenced disablement bounds the _commits/ tax: no adoption LIST on later commits (r13)") {
    val dir = tempTable("cc-fence")
    writeCommit(dir, 0, Seq(protocol, metaData))
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits(registered("im-fence", 1))
    append(dir, "era.parquet") // v2: staged + backfilled (interval 1)
    val dv = DeltaTable.forPath(spark, dir.toString).disableCoordinatedCommits()
    // the disablement commit carries the adoption mark (same version)
    val snap = DeltaLog.forPath(spark, dir.toString).update()
    assert(snap.version == dv)
    assert(snap.domainMetadata.contains(CoordinatedCommits.AdoptionDomain))
    assert(!CoordinatedCommits.isCoordinated(
      snap.metadata.get.configuration))
    // post-fence filesystem commits perform ZERO _commits/ adoption LISTs
    // — from a warm handle AND from a fresh (cold) one
    val before = DeltaLog.commitsDirLists.get()
    append(dir, "after1.parquet")
    val fresh = DeltaLog.forPath(spark, dir.toString)
    fresh.update()
    assert(fresh.startTransaction()
      .addAction(ActionCodec.fromJsonLine(add("after2.parquet")).get).commit() > dv)
    assert(DeltaLog.commitsDirLists.get() == before,
      "marked table must not pay the _commits/ adoption LIST")
    // contents intact: the era's commit and both post-fence commits
    assert(DeltaLog.forPath(spark, dir.toString).update().files.map(_.path).toSet ==
      Set("era.parquet", "after1.parquet", "after2.parquet"))
    // re-enablement tombstones the mark BEFORE the era starts, and the
    // LIST resumes for the new era's filesystem-routed successors only
    // after ITS disablement writes a fresh mark
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits(registered("im-fence2", 1))
    val midEra = DeltaLog.forPath(spark, dir.toString).update()
    assert(!midEra.domainMetadata.contains(CoordinatedCommits.AdoptionDomain),
      "enablement must remove the mark")
    append(dir, "era2.parquet")
    DeltaTable.forPath(spark, dir.toString).disableCoordinatedCommits()
    val after2 = DeltaLog.forPath(spark, dir.toString).update()
    assert(after2.domainMetadata.contains(CoordinatedCommits.AdoptionDomain))
    // and a user cannot forge or clobber the graft.* mark
    intercept[IllegalArgumentException] {
      DeltaTable.forPath(spark, dir.toString)
        .setDomainMetadata(CoordinatedCommits.AdoptionDomain, "{}")
    }
    // nor start an era through bare setProperties — that path would skip
    // coordinator registration AND leave the mark live (r13 review: a
    // stale live mark during an era lets fs writers skip the staged-
    // adoption scan and fork acked history)
    val e2 = intercept[IllegalArgumentException] {
      DeltaTable.forPath(spark, dir.toString).setProperties(
        Map(CoordinatedCommits.CoordinatorNameKey -> "im-fence2"))
    }
    assert(e2.getMessage.contains("enableCoordinatedCommits"))
    // the conf keys are fenced too (r13 advice): clobbering tableConf/
    // coordinatorConf on a coordinated table breaks getCommits routing —
    // the same forged-engine-state class as the name key
    Seq(CoordinatedCommits.TableConfKey,
        CoordinatedCommits.CoordinatorConfKey).foreach { k =>
      val e = intercept[IllegalArgumentException] {
        DeltaTable.forPath(spark, dir.toString).setProperties(Map(k -> "{}"))
      }
      assert(e.getMessage.contains("enableCoordinatedCommits"), k)
    }
    // unset of an ABSENT reserved key stays a no-op (the method's
    // contract — idempotent cleanup scripts must not break on
    // never/no-longer-coordinated tables, r14 review)
    val vNoop = DeltaTable.forPath(spark, dir.toString)
      .unsetProperties(Seq(CoordinatedCommits.CoordinatorNameKey))
    assert(vNoop >= 0)
    // but unsetting a LIVE key must route through
    // disableCoordinatedCommits — a bare unset would end the era without
    // the force-backfill + adoption mark
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits("im-fence2")
    CoordinatedCommits.ReservedKeys.foreach { k =>
      val e = intercept[IllegalArgumentException] {
        DeltaTable.forPath(spark, dir.toString).unsetProperties(Seq(k))
      }
      assert(e.getMessage.contains("disableCoordinatedCommits"), k)
    }
  }

  test("registerTable is monotonic: a stale downward re-seed cannot drop an acked staged commit (r13)") {
    val coord = new InMemoryCommitCoordinator(backfillInterval = 100)
    CommitCoordinatorProvider.register("im-mono", coord)
    val dir = tempTable("cc-mono")
    writeCommit(dir, 0, Seq(protocol, metaData))
    DeltaTable.forPath(spark, dir.toString).enableCoordinatedCommits("im-mono")
    assert(append(dir, "live.parquet") == 2) // staged-only (interval 100), acked
    // a stale registrant (enablement retry / recovery racing the live
    // commit) re-seeds DOWNWARD — must be ignored, not drop v2
    coord.registerTable(DeltaLog.forPath(spark, dir.toString).logPath.toString, 1)
    val (pending, latest) = coord.getCommits(
      DeltaLog.forPath(spark, dir.toString).logPath.toString, Map.empty)
    assert(latest == 2, s"stale re-seed must not rewind latest (got $latest)")
    assert(pending.map(_.version) == Seq(2L), "acked staged commit must survive")
    // and the next writer continues at v3 — no re-claim of v2, no fork
    assert(append(dir, "next.parquet") == 3)
    assert(DeltaLog.forPath(spark, dir.toString).update().files.map(_.path).toSet ==
      Set("live.parquet", "next.parquet"))
  }

  test("RESTORE across a disablement boundary keeps mark and coordination atomic (r13)") {
    val dir = tempTable("cc-restore-mark")
    writeCommit(dir, 0, Seq(protocol, metaData))
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits(registered("im-rmark", 1)) // v1
    // RESTORE refuses adds whose physical files are gone — touch them
    Files.createFile(dir.resolve("era.parquet"))
    Files.createFile(dir.resolve("post.parquet"))
    append(dir, "era.parquet")                             // v2 (coordinated)
    DeltaTable.forPath(spark, dir.toString).disableCoordinatedCommits() // v3 + mark
    append(dir, "post.parquet")                            // v4 (fs-routed)
    // restore to the MID-ERA version: the ONE restore commit must both
    // re-apply the coordinated config AND tombstone the adoption mark —
    // a mark surviving into a coordinated era would let fs writers skip
    // the staged-adoption scan the era depends on
    DeltaTable.forPath(spark, dir.toString).restoreToVersion(2)
    val midEra = DeltaLog.forPath(spark, dir.toString).update()
    assert(CoordinatedCommits.isCoordinated(midEra.metadata.get.configuration),
      "restore to a coordinated version re-applies the coordinated config")
    assert(!midEra.domainMetadata.contains(CoordinatedCommits.AdoptionDomain),
      "the adoption mark must not survive into the restored coordinated era")
    // the next write self-heals the coordinator (its seed lags) and lands
    assert(append(dir, "revived.parquet") > midEra.version)
    // restore FORWARD to the post-disablement state: config clears and the
    // mark returns in the same commit
    val back = DeltaLog.forPath(spark, dir.toString).update().version
    DeltaTable.forPath(spark, dir.toString).restoreToVersion(4)
    val post = DeltaLog.forPath(spark, dir.toString).update()
    assert(post.version > back)
    assert(!CoordinatedCommits.isCoordinated(post.metadata.get.configuration))
    assert(post.domainMetadata.contains(CoordinatedCommits.AdoptionDomain),
      "restoring to a marked version restores the mark with it")
    assert(post.files.map(_.path).toSet == Set("era.parquet", "post.parquet"))
  }

  test("re-created table at the same path: unregisterTable unwedges the stale high seed (r13)") {
    val coord = new InMemoryCommitCoordinator(backfillInterval = 1)
    CommitCoordinatorProvider.register("im-recreate", coord)
    val dir = tempTable("cc-recreate")
    writeCommit(dir, 0, Seq(protocol, metaData))
    DeltaTable.forPath(spark, dir.toString).enableCoordinatedCommits("im-recreate")
    (1 to 3).foreach(i => append(dir, s"old-$i.parquet")) // coordinator latest = 4
    val logPath = DeltaLog.forPath(spark, dir.toString).logPath.toString
    // the table is DELETED and RE-CREATED at the same path
    graft.LocalPaths.deleteRecursively(dir.toFile)
    writeCommit(dir, 0, Seq(protocol, metaData))
    // monotonic registerTable ignores the downward seed: the new table's
    // coordinated commits wedge behind the stale latest=4
    DeltaTable.forPath(spark, dir.toString).enableCoordinatedCommits("im-recreate")
    intercept[Exception] { append(dir, "wedged.parquet") }
    // the explicit operator action for recreation
    coord.unregisterTable(logPath)
    // re-enable on the clean slate (the wedged era's properties are still
    // on the table; same coordinator, so re-registration is legal)
    DeltaTable.forPath(spark, dir.toString).enableCoordinatedCommits("im-recreate")
    val v = append(dir, "new.parquet")
    assert(v >= 2, s"commit must land after unregister, got $v")
    assert(DeltaLog.forPath(spark, dir.toString).update().files.map(_.path).toSet ==
      Set("new.parquet"))
  }

  test("enableCoordinatedCommits refuses a coordinator switch on an already-coordinated table (r13)") {
    val dir = tempTable("cc-switch")
    writeCommit(dir, 0, Seq(protocol, metaData))
    val t = DeltaTable.forPath(spark, dir.toString)
    t.enableCoordinatedCommits(registered("im-old", 100))
    append(dir, "staged.parquet") // un-backfilled tail on the OLD coordinator
    val e = intercept[IllegalStateException] {
      DeltaTable.forPath(spark, dir.toString)
        .enableCoordinatedCommits(registered("im-new", 100))
    }
    assert(e.getMessage.contains("disableCoordinatedCommits"))
    // re-enabling the SAME coordinator stays legal (idempotent re-register)
    assert(DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits("im-old") > 0)
    // and the supported path — disable (force-backfills) then enable new —
    // leaves no gap and loses no commit
    DeltaTable.forPath(spark, dir.toString).disableCoordinatedCommits()
    DeltaTable.forPath(spark, dir.toString)
      .enableCoordinatedCommits(registered("im-new2", 100))
    val files = DeltaLog.forPath(spark, dir.toString).update().files.map(_.path).toSet
    assert(files == Set("staged.parquet"))
  }
}
