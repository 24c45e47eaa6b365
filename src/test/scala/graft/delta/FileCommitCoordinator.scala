package graft.delta

import java.nio.file.{Files, Path => JPath, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

/** DURABLE toy [[CommitCoordinatorClient]] backed by a shared directory —
  * the cross-PROCESS analog of [[InMemoryCommitCoordinator]] (r13 verdict
  * #5): forked writer JVMs share its state through the filesystem, and a
  * SIGKILLed writer loses nothing the coordinator acked, because the ack
  * IS a durable file.
  *
  * State per table under `dir/<sanitized logPath>/`:
  *  - `claim_<v20>` — version v's acked commit (one JSON line: fileName +
  *    timestamp). The claim is the LINEARIZATION POINT and must be
  *    exactly-once across processes: the content is written to a temp
  *    file (fsync'd), then published with `Files.createLink` — POSIX
  *    link(2) fails with EEXIST atomically, so exactly one proposer per
  *    version wins and a claim file can never be observed torn;
  *  - `seed_<v20>` — registerTable marks; the effective seed is the max
  *    (monotonic by construction — stale low re-seeds are no-ops);
  *  - `backfilled_<v20>` — registerBackfill marks; pending = claims above
  *    max(seed, backfilled).
  *
  * latest = max(seed, claims); commit(v) requires v == latest+1 and then
  * races on the link. Halt injection: `graft.storm.haltBeforeClaim` /
  * `haltAfterClaim` system properties fire Runtime.halt at the claim
  * boundary (after-claim = acked at the coordinator, writer dead before
  * learning it — the recovery shape that must never fork). */
final class FileCommitCoordinator(dir: String,
    override val backfillInterval: Int = 1) extends CommitCoordinatorClient {

  private val pBefore =
    sys.props.get("graft.storm.haltBeforeClaim").map(_.toDouble).getOrElse(0.0)
  private val pAfter =
    sys.props.get("graft.storm.haltAfterClaim").map(_.toDouble).getOrElse(0.0)
  private val rnd = new java.util.Random(
    sys.props.get("graft.storm.haltSeed").map(_.toLong).getOrElse(7L))

  private def tableDir(logPath: String): JPath =
    // the hash suffix keeps the mapping injective: sanitization alone can
    // collapse two distinct paths ('/a b' vs '/a_b') into one state dir,
    // cross-arbitrating their versions (r14 third review pass)
    Paths.get(dir, logPath.replaceAll("[^A-Za-z0-9._-]", "_") +
      "-" + Integer.toHexString(logPath.hashCode))

  /** ONE directory listing, closed deterministically — Files.list leaks a
    * directory fd per call otherwise, and storm writers list in tight
    * retry loops (r14 third review pass). */
  private def listNames(d: JPath): Seq[String] =
    if (!Files.isDirectory(d)) Nil
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }

  private def versionsOf(names: Seq[String], prefix: String): Seq[Long] =
    names.filter(_.startsWith(prefix)).map(_.stripPrefix(prefix).toLong).sorted

  private def markerMax(names: Seq[String], prefix: String): Long =
    versionsOf(names, prefix).lastOption.getOrElse(-1L)

  private def latestOf(names: Seq[String]): Long =
    math.max(markerMax(names, "seed_"), markerMax(names, "claim_"))

  private def writeMarker(d: JPath, name: String): Unit = {
    try Files.createFile(d.resolve(name))
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }

  override def registerTable(logPath: String,
                             currentVersion: Long): Map[String, String] = {
    val d = tableDir(logPath)
    Files.createDirectories(d)
    // max-over-markers makes registration monotonic without read-modify-
    // write: a stale low seed lands as a file nothing ever reads
    if (currentVersion >= 0)
      writeMarker(d, f"seed_$currentVersion%020d")
    // reclaim tmp files stranded by halted commits (the halt fires before
    // the finally) — only STALE ones, or we would race an in-flight
    // commit's tmp between its write and its link (r14 third review pass)
    val cutoff = System.currentTimeMillis() - 10 * 60 * 1000
    listNames(d).filter(n => n.startsWith(".claim.") && n.endsWith(".tmp"))
      .foreach { n =>
        val p = d.resolve(n)
        try {
          if (Files.getLastModifiedTime(p).toMillis < cutoff)
            Files.deleteIfExists(p)
        } catch { case _: java.io.IOException => () }
      }
    Map("graft.coordinated.tableDir" -> d.toString)
  }

  override def commit(logPath: String, tableConf: Map[String, String],
                      commit: CoordinatedCommit): Unit = {
    val d = tableDir(logPath)
    if (!Files.isDirectory(d))
      throw new IllegalStateException(
        s"file coordinator has no state for $logPath — registerTable first")
    val latest = latestOf(listNames(d))
    if (commit.version != latest + 1)
      throw new CommitVersionConflictException(commit.version, latest)
    val tmp = d.resolve(s".claim.${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, s"${commit.fileName},${commit.timestampMillis}\n"
        .getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.SYNC)
    if (rnd.nextDouble() < pBefore) Runtime.getRuntime.halt(137)
    try {
      try Files.createLink(d.resolve(f"claim_${commit.version}%020d"), tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new CommitVersionConflictException(commit.version, latest + 1)
      }
      if (rnd.nextDouble() < pAfter) Runtime.getRuntime.halt(137)
    } finally Files.deleteIfExists(tmp)
  }

  override def getCommits(logPath: String, tableConf: Map[String, String],
                          startVersion: Option[Long])
      : (Seq[CoordinatedCommit], Long) = {
    val d = tableDir(logPath)
    if (!Files.isDirectory(d)) return (Nil, -1L)
    // ONE listing feeds pending AND latest: two scans let a claim landing
    // between them appear in latest but not pending, so a reader would
    // conflict-classify a version it cannot resolve — a hard failure on a
    // healthy log (r14 third review pass)
    val names = listNames(d)
    val floor = math.max(markerMax(names, "seed_"),
      markerMax(names, "backfilled_"))
    val from = math.max(startVersion.getOrElse(Long.MinValue), floor + 1)
    val pending = versionsOf(names, "claim_").filter(_ >= from).map { v =>
      // claims are immortal until unregisterTable, and the link publishes
      // complete-or-absent — a read failure here is a real fault and must
      // surface, not silently hide an ACKED commit from a fresh reader
      val Array(name, ts) = Files.readAllLines(
        d.resolve(f"claim_$v%020d")).asScala.head.split(",")
      CoordinatedCommit(v, name, ts.toLong)
    }
    (pending, latestOf(names))
  }

  override def registerBackfill(logPath: String,
                                backfilledThrough: Long): Unit = {
    val d = tableDir(logPath)
    if (Files.isDirectory(d) && backfilledThrough >= 0)
      writeMarker(d, f"backfilled_$backfilledThrough%020d")
  }

  override def unregisterTable(logPath: String): Unit = {
    val d = tableDir(logPath)
    listNames(d).foreach(n => Files.deleteIfExists(d.resolve(n)))
    Files.deleteIfExists(d)
  }
}
