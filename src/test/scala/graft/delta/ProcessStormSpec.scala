package graft.delta

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Path => JPath}
import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Cross-PROCESS commit storm (r11 verdict #5). CommitStormSpec and
  * DmlStormSpec prove commit safety across threads in one JVM;
  * the atomic-rename contract's real risk is separate processes — no
  * shared JVM locks, no shared DeltaLog caches, death is SIGKILL-shaped.
  * Here 3 real writer JVMs ([[ProcessStormWriter]]) race on one table
  * while crashes are injected two ways: the parent `destroyForcibly`s
  * children mid-run (SIGKILL), and [[HaltingLogStoreFactory]] fires
  * `Runtime.halt` at the rename points themselves (immediately before
  * and immediately after the commit file appears). Invariants:
  *
  *  - versions are CONTIGUOUS and each exists exactly once (the rename
  *    primitive's exactly-once claim, now across process boundaries);
  *  - every commit file parses completely (a crash can never publish a
  *    torn commit — content is fully written before the rename);
  *  - every ACKED commit (writer acked only after commit() returned) is
  *    durable: its version file exists and contains its add;
  *  - no two acks claim the same version;
  *  - a fresh reader replays the final log without error and sees every
  *    acked writer file. */
class ProcessStormSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures._

  /** Fork one writer JVM; inherits this JVM's classpath and module opens. */
  private def forkWriter(table: JPath, id: String, nCommits: Int,
                         extraProps: Seq[String] = Nil): Process = {
    val java = System.getProperty("java.home") + "/bin/java"
    val inherited = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("-Dfile.encoding"))
    val cmd = Seq(java) ++ inherited ++ Seq("-Xmx1g") ++ extraProps ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.delta.ProcessStormWriter", table.toString, id, nCommits.toString)
    new ProcessBuilder(cmd.asJava)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .redirectError(ProcessBuilder.Redirect.appendTo(
        table.resolve(s"_storm_err_$id.log").toFile))
      .start()
  }

  /** Run writer `id` to completion, restarting after every crash (parent
    * kill or self-halt). `propsFor(attempt)` lets halt seeds VARY per
    * attempt — a fixed seed would replay the same halt decision on every
    * restart and crash-loop forever. Returns restarts used. */
  private def runToCompletion(table: JPath, id: String, nCommits: Int,
                              propsFor: Int => Seq[String],
                              maxRestarts: Int): Int = {
    var restarts = 0
    var done = false
    while (!done) {
      val p = forkWriter(table, id, nCommits, propsFor(restarts))
      val exited = p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      assert(exited, s"writer $id hung")
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

  /** Run all three writers to completion CONCURRENTLY (each may crash and
    * restart on its own thread — processes keep racing throughout). */
  private def raceToCompletion(table: JPath, nCommits: Int,
                               propsFor: (Int, Int) => Seq[String],
                               maxRestarts: Int): Seq[Int] = {
    val threads = (0 until 3).map { w =>
      val t = new java.util.concurrent.FutureTask(() =>
        runToCompletion(table, w.toString, nCommits, propsFor(w, _), maxRestarts))
      new Thread(t, s"storm-runner-$w").start()
      t
    }
    threads.map(_.get(600, java.util.concurrent.TimeUnit.SECONDS))
  }

  private def commitVersions(table: JPath): Seq[Long] =
    Files.list(table.resolve("_delta_log")).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.matches("""\d{20}\.json""") => n.take(20).toLong }
      .toSeq.sorted

  private def acks(table: JPath): Seq[(String, Int, Long)] =
    Files.list(table).iterator().asScala
      .filter(_.getFileName.toString.startsWith("_storm_ack_"))
      .flatMap(p => Files.readAllLines(p).asScala.filter(_.nonEmpty))
      .map { l => val a = l.split(","); (a(0), a(1).toInt, a(2).toLong) }
      .toSeq

  private def assertStormInvariants(table: JPath): Unit = {
    val log = DeltaLog.forPath(spark, table.toString)
    log.update()
    val versions = commitVersions(table)
    assert(versions == (0L to versions.max),
      s"versions not contiguous: $versions")
    // every commit parses completely — no torn publishes
    versions.foreach(v => assert(log.readCommit(v).nonEmpty, s"v$v unreadable"))
    val as = acks(table)
    // acked exactly-once per version
    as.groupBy(_._3).foreach { case (v, claims) =>
      assert(claims.size == 1, s"version $v acked twice: $claims")
    }
    // every acked commit is durable and carries its add
    as.foreach { case (id, i, v) =>
      assert(versions.contains(v), s"acked v$v missing from the log")
      val paths = log.readCommit(v).collect { case a: AddAction => a.path }
      assert(paths.contains(s"w$id-$i.parquet"),
        s"acked add w$id-$i.parquet not in v$v")
    }
    // a fresh reader replays the whole thing and sees every acked file
    val snap = DeltaLog.forPath(spark, table.toString).update()
    assert(snap.version == versions.max)
    val active = snap.files.map(_.path).toSet
    as.foreach { case (id, i, _) =>
      assert(active.contains(s"w$id-$i.parquet"),
        s"acked w$id-$i.parquet not visible to a fresh reader")
    }
  }

  test("3 writer JVMs with parent SIGKILLs: exactly-once contiguous versions, acked commits durable") {
    val table = tempTable("pstorm-kill")
    writeCommit(table, 0, Seq(protocol, metaData))
    val n = 8
    // phase 1: start all three, SIGKILL two mid-flight
    val first = (0 until 3).map(w => forkWriter(table, w.toString, n))
    Thread.sleep(9000) // mid-Spark-startup / mid-commit-loop
    first(0).destroyForcibly().waitFor()
    first(2).destroyForcibly().waitFor()
    first.foreach(_.waitFor(180, java.util.concurrent.TimeUnit.SECONDS))
    // phase 2: all three race concurrently to finish their quotas
    raceToCompletion(table, n, (_, _) => Nil, maxRestarts = 5)
    assertStormInvariants(table)
    // everyone finished: all 3×8 acked indices present
    val ackSet = acks(table).map(a => (a._1, a._2)).toSet
    assert(ackSet == (for (w <- 0 until 3; i <- 0 until n) yield (w.toString, i)).toSet)
  }

  test("self-halt at the rename points (before AND after): the log never tears, acks never lie") {
    val table = tempTable("pstorm-halt")
    writeCommit(table, 0, Seq(protocol, metaData))
    val n = 6
    val restarts = raceToCompletion(table, n,
      propsFor = (w, attempt) => Seq(
        "-Dgraft.storm.haltBeforeRename=0.10",
        "-Dgraft.storm.haltAfterRename=0.10",
        s"-Dgraft.storm.haltSeed=${1000 + w * 100 + attempt}"),
      maxRestarts = 12)
    info(s"halt-injected restarts per writer: $restarts")
    assertStormInvariants(table)
    val ackSet = acks(table).map(a => (a._1, a._2)).toSet
    assert(ackSet == (for (w <- 0 until 3; i <- 0 until n) yield (w.toString, i)).toSet)
  }
}
