package graft.delta

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Path => JPath}
import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Cross-PROCESS coordinated-commits storm (r13 verdict #5).
  * CoordinatedCommitsSpec storms the protocol in one JVM; here the
  * coordinator is the durable [[FileCommitCoordinator]] shared by real
  * writer JVMs ([[CoordinatedStormWriter]]), and crashes are injected as
  * parent SIGKILLs, Runtime.halt at the coordinator CLAIM boundary (before
  * and — the critical shape — immediately AFTER the claim, i.e. acked at
  * the coordinator with a dead writer), and halts at the backfill renames.
  * Invariants:
  *  - claims are exactly-once and contiguous (the link(2) linearization);
  *  - every acked commit is durable and serves its add to a fresh reader
  *    (staged-only tail included);
  *  - no version is ever forked (the classic copy, when present, is the
  *    claimed staged file's content);
  *  - disablement force-backfills to a complete classic log. */
class CoordinatedProcessStormSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures._

  private def forkWriter(table: JPath, coordDir: String, id: String,
                         nCommits: Int, extraProps: Seq[String]): Process = {
    val java = System.getProperty("java.home") + "/bin/java"
    val inherited = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("-Dfile.encoding"))
    val cmd = Seq(java) ++ inherited ++ Seq("-Xmx1g") ++ extraProps ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.delta.CoordinatedStormWriter",
      table.toString, id, nCommits.toString, coordDir)
    new ProcessBuilder(cmd.asJava)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .redirectError(ProcessBuilder.Redirect.appendTo(
        table.resolve(s"_storm_err_$id.log").toFile))
      .start()
  }

  private def runToCompletion(table: JPath, coordDir: String, id: String,
                              nCommits: Int, propsFor: Int => Seq[String],
                              maxRestarts: Int): Int = {
    var restarts = 0
    var done = false
    while (!done) {
      val p = forkWriter(table, coordDir, id, nCommits, propsFor(restarts))
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        s"writer $id hung")
      if (p.exitValue() == 0) done = true
      else {
        restarts += 1
        assert(restarts <= maxRestarts,
          s"writer $id crashed more than $maxRestarts times " +
          s"(see ${table.resolve(s"_storm_err_$id.log")})")
      }
    }
    restarts
  }

  private def raceToCompletion(table: JPath, coordDir: String, nCommits: Int,
                               propsFor: (Int, Int) => Seq[String],
                               maxRestarts: Int): Seq[Int] = {
    val tasks = (0 until 3).map { w =>
      val t = new java.util.concurrent.FutureTask(() =>
        runToCompletion(table, coordDir, w.toString, nCommits,
          propsFor(w, _), maxRestarts))
      new Thread(t, s"cstorm-runner-$w").start()
      t
    }
    tasks.map(_.get(600, java.util.concurrent.TimeUnit.SECONDS))
  }

  private def acks(table: JPath): Seq[(String, Int, Long)] =
    Files.list(table).iterator().asScala
      .filter(_.getFileName.toString.startsWith("_storm_ack_"))
      .flatMap(p => Files.readAllLines(p).asScala.filter(_.nonEmpty))
      .map { l => val a = l.split(","); (a(0), a(1).toInt, a(2).toLong) }
      .toSeq

  /** Fresh parent-side coordinator over the same durable state. */
  private def coordinator(coordDir: String): FileCommitCoordinator =
    new FileCommitCoordinator(coordDir, backfillInterval = 3)

  private def assertStormInvariants(table: JPath, coordDir: String): Unit = {
    CommitCoordinatorProvider.register("storm-file", coordinator(coordDir))
    val log = DeltaLog.forPath(spark, table.toString)
    val snap = log.update()
    val as = acks(table)
    // acked exactly-once per version
    as.groupBy(_._3).foreach { case (v, claims) =>
      assert(claims.size == 1, s"version $v acked twice: $claims")
    }
    // every acked commit is readable at its version and carries its add
    assert(snap.version >= as.map(_._3).max)
    as.foreach { case (id, i, v) =>
      val paths = log.readCommit(v).collect { case a: AddAction => a.path }
      assert(paths.contains(s"w$id-$i.parquet"),
        s"acked add w$id-$i.parquet not in v$v")
    }
    // fresh reader serves every acked file (staged-only tail included)
    val active = snap.files.map(_.path).toSet
    as.foreach { case (id, i, _) =>
      assert(active.contains(s"w$id-$i.parquet"),
        s"acked w$id-$i.parquet not visible to a fresh reader")
    }
    // no forked version: where a classic copy exists alongside the claim's
    // staged file, they carry identical bytes
    val (pending, _) = coordinator(coordDir)
      .getCommits(log.logPath.toString, Map.empty)
    pending.foreach { cc =>
      val classic = log.commitFile(cc.version)
      val staged = new org.apache.hadoop.fs.Path(log.commitsDir, cc.fileName)
      if (log.store.exists(classic))
        assert(log.store.read(classic) == log.store.read(staged),
          s"v${cc.version} forked: classic != claimed staged content")
    }
    // disablement force-backfills: classic log complete and contiguous
    DeltaTable.forPath(spark, table.toString).disableCoordinatedCommits()
    val versions = Files.list(table.resolve("_delta_log")).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.matches("""\d{20}\.json""") => n.take(20).toLong }
      .toSeq.sorted
    assert(versions == (0L to versions.max), s"classic log gapped: $versions")
    val finalSnap = DeltaLog.forPath(spark, table.toString).update()
    as.foreach { case (id, i, _) =>
      assert(finalSnap.files.map(_.path).contains(s"w$id-$i.parquet")) }
  }

  private def setupTable(name: String): (JPath, String) = {
    val table = tempTable(name)
    writeCommit(table, 0, Seq(protocol, metaData))
    val coordDir = Files.createTempDirectory(s"$name-coord-").toString
    CommitCoordinatorProvider.register("storm-file", coordinator(coordDir))
    DeltaTable.forPath(spark, table.toString)
      .enableCoordinatedCommits("storm-file")
    (table, coordDir)
  }

  test("3 coordinated writer JVMs with parent SIGKILLs: acked commits durable, no forks") {
    val (table, coordDir) = setupTable("cpstorm-kill")
    val n = 6
    val first = (0 until 3).map(w =>
      forkWriter(table, coordDir, w.toString, n, Nil))
    Thread.sleep(9000) // mid-startup / mid-commit-loop
    first(0).destroyForcibly().waitFor()
    first(2).destroyForcibly().waitFor()
    first.foreach(_.waitFor(180, java.util.concurrent.TimeUnit.SECONDS))
    raceToCompletion(table, coordDir, n, (_, _) => Nil, maxRestarts = 5)
    assertStormInvariants(table, coordDir)
    val ackSet = acks(table).map(a => (a._1, a._2)).toSet
    assert(ackSet ==
      (for (w <- 0 until 3; i <- 0 until n) yield (w.toString, i)).toSet)
  }

  test("halts at claim boundary and backfill renames: acked never lost, history never forks") {
    val (table, coordDir) = setupTable("cpstorm-halt")
    val n = 5
    // crash probability per commit ≈ 0.15 (two claim gates + the backfill
    // renames every 3rd commit): enough injected deaths to exercise every
    // crash point across three writers without a restart runaway (the
    // r14 first run at 0.12/0.08 needed 16 restarts for one writer)
    val restarts = raceToCompletion(table, coordDir, n,
      propsFor = (w, attempt) => Seq(
        "-Dgraft.storm.haltBeforeClaim=0.06",
        "-Dgraft.storm.haltAfterClaim=0.06",
        "-Dgraft.storm.haltBeforeRename=0.04",
        "-Dgraft.storm.haltAfterRename=0.04",
        s"-Dgraft.storm.haltSeed=${5000 + w * 100 + attempt}"),
      maxRestarts = 20)
    info(s"claim/backfill-halt restarts per writer: $restarts")
    assertStormInvariants(table, coordDir)
    val ackSet = acks(table).map(a => (a._1, a._2)).toSet
    assert(ackSet ==
      (for (w <- 0 until 3; i <- 0 until n) yield (w.toString, i)).toSet)
  }

  test("claim linearization is exactly-once across 60 seeded thread storms") {
    // the primitive under the JVM storms, at seed volume: racing claimants
    // per version, every version claimed exactly once, contiguous
    (0 until 60).foreach { seed =>
      val coordDir = Files.createTempDirectory(s"claimrace-$seed-").toString
      val c = new FileCommitCoordinator(coordDir)
      val logPath = s"/fake/table-$seed/_delta_log"
      c.registerTable(logPath, 0L)
      val rnd = new scala.util.Random(seed)
      val nVersions = 2 + rnd.nextInt(6)
      (1 to nVersions).foreach { v =>
        val winners = new java.util.concurrent.atomic.AtomicInteger
        val threads = (0 until 4).map { t =>
          new Thread(() => {
            try {
              c.commit(logPath, Map.empty,
                CoordinatedCommit(v.toLong, s"f-$v-$t.json", v * 10L + t))
              winners.incrementAndGet(): Unit
            } catch { case _: CommitVersionConflictException => () }
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        assert(winners.get() == 1, s"seed $seed v$v: ${winners.get()} winners")
      }
      val (pending, latest) = c.getCommits(logPath, Map.empty)
      assert(latest == nVersions.toLong)
      assert(pending.map(_.version) == (1L to nVersions))
      // backfill marker prunes the pending view, latest stays
      c.registerBackfill(logPath, nVersions - 1L)
      val (p2, l2) = c.getCommits(logPath, Map.empty)
      assert(p2.map(_.version) == Seq(nVersions.toLong) && l2 == nVersions)
    }
  }
}
