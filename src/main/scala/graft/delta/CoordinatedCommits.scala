package graft.delta

import java.util.UUID
import scala.collection.mutable

import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}

/** Coordinated commits — delta-spark's `coordinatedCommits-preview` writer
  * feature (Delta 4.0 preview), the last modern-protocol capability graft
  * refused wholesale (r11 verdict #4).
  *
  * Protocol shape (public delta-spark/PROTOCOL.md semantics):
  *
  *  - A table OPTS IN by naming a commit coordinator in its configuration
  *    ([[CoordinatedCommits.CoordinatorNameKey]]). From then on the
  *    filesystem's atomic rename is no longer the commit arbiter — the
  *    COORDINATOR is: each commit's actions are staged as a UUID-named
  *    file under `_delta_log/_commits/` and the version is claimed by a
  *    `commit(version)` call the coordinator accepts exactly once.
  *  - Staged commits are BACKFILLED — copied to the classic
  *    `_delta_log/%020d.json` names — so feature-unaware readers see a
  *    stale-but-consistent table (it is a writer feature: plain readers
  *    stay legal, merely bounded-stale until backfill).
  *  - Readers that DO know the coordinator merge its un-backfilled tail
  *    over the filesystem listing ([[DeltaLog.update]]) and therefore
  *    read the true latest version.
  *  - DISABLING the feature (removing the properties) commits through the
  *    coordinator one last time and must leave the log fully backfilled —
  *    otherwise the next filesystem-routed writer would re-claim an
  *    un-backfilled version number and fork history
  *    ([[OptimisticTransaction]] forces a full backfill on that commit).
  *
  * The coordinator itself is a SEAM, exactly the [[LockClient]] pattern:
  * the protocol logic (stage → claim → backfill → merge-on-read) is
  * engine code proven against [[InMemoryCommitCoordinator]]; a production
  * deployment registers a client backed by a real service (DynamoDB,
  * a catalog, Unity-style) under the same
  * [[CommitCoordinatorProvider]] name. The reference (delta-rs 0.4.1)
  * predates the feature entirely — its tables stop at rename-arbitrated
  * commits (`rust/src/delta.rs:998-1014`); this implements the
  * delta-spark-era protocol on top of the same LogStore primitives.
  */
object CoordinatedCommits {

  /** Table property naming the commit coordinator (delta-spark preview
    * key). */
  val CoordinatorNameKey = "delta.coordinatedCommits.commitCoordinator-preview"
  /** Coordinator-specific configuration (JSON object, opaque here). */
  val CoordinatorConfKey = "delta.coordinatedCommits.commitCoordinatorConf-preview"
  /** Coordinator-issued per-table configuration (JSON object), returned by
    * [[CommitCoordinatorClient.registerTable]] at enablement. */
  val TableConfKey = "delta.coordinatedCommits.tableConf-preview"

  /** All three coordinated-commits properties: settable ONLY through
    * [[graft.delta.DeltaTable.enableCoordinatedCommits]] / unset ONLY
    * through `disableCoordinatedCommits` — bare property DDL clobbering
    * any of them forges the engine's routing state (r13 advice). */
  val ReservedKeys: Set[String] =
    Set(CoordinatorNameKey, CoordinatorConfKey, TableConfKey)

  /** Writer table-feature name (delta-spark preview string; the bare name
    * is accepted on foreign tables too). */
  val Feature = "coordinatedCommits-preview"
  val FeatureBare = "coordinatedCommits"

  /** `_delta_log/_commits/` — where un-backfilled commits live. */
  def commitsDir(logPath: Path): Path = new Path(logPath, "_commits")

  /** Staged-commit naming: `%020d.<uuid>.json` — version-prefixed so a
    * listing sorts by version, UUID-suffixed so racing writers for the
    * same version never collide on a name. */
  def stagedName(version: Long): String =
    s"${DeltaLog.pad20(version)}.${UUID.randomUUID()}.json"
  private[delta] val StagedRe = """^(\d{20})\.([^.]+)\.json$""".r

  /** Backfill's transient copy name under `_delta_log/` (crash leftovers
    * are retention-swept by [[DeltaLog.cleanUpExpiredLogs]]). */
  private[delta] def BackfillTmpName(uuid: String): String = s"_backfill_$uuid.json"
  private[delta] val BackfillTmpRe = """^_backfill_[0-9a-fA-F-]+\.json$""".r

  /** Domain metadata the DISABLEMENT commit writes (r12 verdict #3): its
    * presence in a NOT-coordinated snapshot proves "no coordinated era has
    * started since this mark" (re-enablement tombstones it in a commit
    * that precedes the new era), so a filesystem-routed writer can skip
    * the per-commit `_commits/` adoption LIST entirely. Safety argument:
    * backfill and adoption both claim classic names ASCENDING, so a
    * coordinated era's classic names form a PREFIX of the era — if the
    * mark-bearing disablement commit is readable from a classic name, every
    * acked commit before it is too; if it is only readable through a live
    * coordinator's staged tail, `repairStagedGaps` (which runs before
    * adoption on every write path) heals that tracked tail first. The
    * domain is graft-system-controlled (`graft.*` refuses user writes). */
  val AdoptionDomain = "graft.coordinatedCommits"

  /** `builtAtVersion` is DIAGNOSTIC ONLY: it is the snapshot version the
    * disablement transaction was built against, which under commit retries
    * can trail the version the disablement actually lands at — the
    * contract is the mark's PRESENCE ([[hasAdoptionMark]]), never the
    * payload. */
  def adoptionMarkJson(builtAtVersion: Long): String =
    s"""{"builtAtVersion":$builtAtVersion}"""

  /** The mark's presence (parsed or not — an unparsable payload still
    * proves a graft disablement wrote it) in live domain metadata. */
  def hasAdoptionMark(snap: Snapshot): Boolean =
    snap.domainMetadata.contains(AdoptionDomain)

  def coordinatorNameOf(config: Map[String, String]): Option[String] =
    config.get(CoordinatorNameKey).map(_.trim).filter(_.nonEmpty)

  def isCoordinated(config: Map[String, String]): Boolean =
    coordinatorNameOf(config).isDefined

  /** Parse the opaque JSON table conf into a flat string map (absent or
    * malformed → empty — the conf is coordinator-private data). */
  def tableConfOf(config: Map[String, String]): Map[String, String] =
    config.get(TableConfKey).map { json =>
      try {
        val n = ActionCodec.mapper.readTree(json)
        val b = Map.newBuilder[String, String]
        n.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asText)
        b.result()
      } catch { case scala.util.control.NonFatal(_) => Map.empty[String, String] }
    }.getOrElse(Map.empty)

  private[delta] def toJson(m: Map[String, String]): String = {
    val o = ActionCodec.mapper.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
    ActionCodec.mapper.writeValueAsString(o)
  }

  /** Coordinator client for READS: None when the table is not coordinated
    * OR the named coordinator is not registered here — a reader without
    * the coordinator legally serves the stale-but-consistent backfilled
    * view (writer feature). */
  def clientForRead(snap: Snapshot): Option[(CommitCoordinatorClient, Map[String, String])] = {
    val cfg = snap.metadata.map(_.configuration).getOrElse(Map.empty)
    coordinatorNameOf(cfg).flatMap(CommitCoordinatorProvider.lookup)
      .map(c => c -> tableConfOf(cfg))
  }

  /** Coordinator client for WRITES: as [[clientForRead]], but an unknown
    * coordinator name REFUSES instead of degrading — committing past the
    * coordinator would fork the table ([[ProtocolSupport.assertWritable]]
    * raises the same fence; this is the belt to that suspender). */
  def clientForWrite(snap: Snapshot): Option[(CommitCoordinatorClient, Map[String, String])] = {
    val cfg = snap.metadata.map(_.configuration).getOrElse(Map.empty)
    coordinatorNameOf(cfg).map { name =>
      CommitCoordinatorProvider.lookup(name).getOrElse(
        throw new UnsupportedProtocolException(
          s"unsupported Delta table: commits route through commit " +
          s"coordinator '$name', which is not registered in this process " +
          "(CommitCoordinatorProvider.register)")) -> tableConfOf(cfg)
    }
  }

  /** Copy every un-backfilled commit the coordinator still tracks to its
    * classic `%020d.json` name, oldest first, then tell the coordinator.
    * Idempotent and race-safe: an already-present destination (a
    * concurrent backfiller, or a crash between copy and register) is
    * skipped — the bytes are identical by construction, the staged file
    * is the source of truth until `registerBackfill` drops it. Returns
    * the highest version backfilled (-1 when nothing was pending). */
  def backfill(log: DeltaLog, client: CommitCoordinatorClient,
               tableConf: Map[String, String]): Long = {
    val (pending, _) = client.getCommits(log.logPath.toString, tableConf)
    var through = -1L
    pending.sortBy(_.version).foreach { c =>
      val dst = log.commitFile(c.version)
      if (!log.store.exists(dst))
        // tmp copy + atomic claim + AlreadyExists-tolerant + tmp
        // reclamation on any failure — one shared implementation
        // (DeltaLog.claimClassic) since the r12 second-pass review
        log.claimClassic(new Path(commitsDir(log.logPath), c.fileName), dst)
      through = c.version
    }
    if (through >= 0) client.registerBackfill(log.logPath.toString, through)
    through
  }
}

/** One coordinator-tracked commit. `fileName` is relative to
  * `_delta_log/_commits/`. */
final case class CoordinatedCommit(version: Long, fileName: String,
                                   timestampMillis: Long)

/** The proposed version is not the coordinator's next — another writer
  * claimed it first (retryable: refresh and re-propose). */
final class CommitVersionConflictException(version: Long, latest: Long)
  extends RuntimeException(
    s"coordinated commit conflict: proposed version $version but the " +
    s"coordinator's latest is $latest")

/** The commit-arbitration service surface a coordinated table routes
  * through. Every method must be ATOMIC per table; `commit` must accept a
  * version exactly once (the linearization point that replaces
  * rename-no-replace). */
trait CommitCoordinatorClient {
  /** Register (or re-register) a table; returns coordinator-issued table
    * conf to persist under [[CoordinatedCommits.TableConfKey]].
    * `currentVersion` is the table's latest version at enablement — the
    * coordinator arbitrates versions AFTER it. Re-registration MUST be
    * monotonic: a `currentVersion` at or below the tracked latest is a
    * no-op (never drops tracked commits) — a stale registrant racing a
    * live coordinated commit must not un-ack it, or history forks. */
  def registerTable(logPath: String, currentVersion: Long): Map[String, String]

  /** Claim `commit.version` as the next version. Throws
    * [[CommitVersionConflictException]] when the version is not latest+1
    * (the staged file the caller wrote is then garbage — caller deletes). */
  def commit(logPath: String, tableConf: Map[String, String],
             commit: CoordinatedCommit): Unit

  /** Un-backfilled commits ascending (≥ `startVersion` when given) plus
    * the coordinator's latest table version (-1 = none/unknown table —
    * unknown tables are NOT an error here: a fresh process reading a
    * coordinated table before any new commit sees the backfilled view). */
  def getCommits(logPath: String, tableConf: Map[String, String],
                 startVersion: Option[Long] = None): (Seq[CoordinatedCommit], Long)

  /** Commits ≤ `backfilledThrough` are now present at their classic names;
    * the coordinator may stop tracking them. */
  def registerBackfill(logPath: String, backfilledThrough: Long): Unit

  /** Drop ALL state for a table path — the explicit operator action for a
    * table DELETED AND RE-CREATED at the same path. Monotonic
    * [[registerTable]] deliberately cannot walk a seed backwards (a stale
    * registrant racing a live commit must not un-ack it), so recreation
    * needs this escape hatch: without it the stale high seed wedges every
    * coordinated commit of the new table behind a version conflict.
    * Deliberately NOT defaulted to a no-op: an operator following the
    * recovery procedure against a client that silently did nothing would
    * believe the fix applied while the table stays wedged. */
  def unregisterTable(logPath: String): Unit =
    throw new UnsupportedOperationException(
      s"${getClass.getName} does not implement unregisterTable — the " +
      "table-recreation escape hatch requires coordinator support")

  /** Writers backfill after every commit whose version is a multiple of
    * this (1 = every commit), and ALWAYS on feature disablement. */
  def backfillInterval: Int = 1
}

/** In-process [[CommitCoordinatorClient]]: one synchronized state slot per
  * table path, process-wide (all sessions/logs in a JVM share it, like a
  * real external service shares state across its callers). The
  * concurrency burden sits in the PROTOCOL — stage, claim-exactly-once,
  * backfill, merge-on-read — which is exactly what the spec's storms
  * exercise; a production client implements this trait over a service
  * with durable conditional writes (the [[InMemoryLockBackend]] pattern
  * one level up). */
final class InMemoryCommitCoordinator(
    override val backfillInterval: Int = 1) extends CommitCoordinatorClient {

  private final class TableState(var latest: Long) {
    val unbackfilled = mutable.TreeMap[Long, CoordinatedCommit]()
  }
  private val tables = mutable.Map[String, TableState]()

  /** Idempotent at or below the tracked version; a HIGHER `currentVersion`
    * re-seeds forward (the caller proved the filesystem/adopted log reaches
    * it) and drops the tracked tail it supersedes. Re-seeding is MONOTONIC:
    * a `currentVersion` below the tracked latest is ignored — a stale
    * registrant (enablement retry, recovery racing a live commit) must not
    * drop an already-acked staged commit, or the next writer re-claims its
    * version and acked history forks. Production implementations of the
    * trait must honor the same contract. */
  override def registerTable(logPath: String, currentVersion: Long): Map[String, String] =
    synchronized {
      val st = tables.getOrElseUpdate(logPath, new TableState(currentVersion))
      // commit() keeps every unbackfilled key ≤ latest, so latest alone
      // decides whether this moves the seed forward
      if (currentVersion > st.latest) {
        st.latest = currentVersion
        st.unbackfilled.clear()
      }
      Map("graft.coordinated.tableId" -> UUID.randomUUID().toString)
    }

  override def commit(logPath: String, tableConf: Map[String, String],
                      commit: CoordinatedCommit): Unit = synchronized {
    val st = tables.getOrElse(logPath, throw new IllegalStateException(
      s"in-memory coordinator has no state for $logPath — registerTable " +
      "first (its state is process-lifetime; a production coordinator is " +
      "durable)"))
    if (commit.version != st.latest + 1)
      throw new CommitVersionConflictException(commit.version, st.latest)
    st.unbackfilled(commit.version) = commit
    st.latest = commit.version
  }

  override def getCommits(logPath: String, tableConf: Map[String, String],
                          startVersion: Option[Long]): (Seq[CoordinatedCommit], Long) =
    synchronized {
      tables.get(logPath) match {
        case None => (Nil, -1L)
        case Some(st) =>
          val from = startVersion.getOrElse(Long.MinValue)
          (st.unbackfilled.valuesIterator.filter(_.version >= from).toSeq, st.latest)
      }
    }

  override def registerBackfill(logPath: String, backfilledThrough: Long): Unit =
    synchronized {
      tables.get(logPath).foreach { st =>
        st.unbackfilled.keys.takeWhile(_ <= backfilledThrough).toSeq
          .foreach(st.unbackfilled.remove)
      }
    }

  override def unregisterTable(logPath: String): Unit =
    synchronized { tables.remove(logPath): Unit }
}

/** Process-wide name → client registry (the builder-side seam: deployments
  * register their service-backed client under the name tables carry in
  * [[CoordinatedCommits.CoordinatorNameKey]]). `in-memory` is
  * pre-registered. */
object CommitCoordinatorProvider {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitCoordinatorClient]()
  register("in-memory", new InMemoryCommitCoordinator())

  def register(name: String, client: CommitCoordinatorClient): Unit =
    registry.put(name, client)

  def lookup(name: String): Option[CommitCoordinatorClient] =
    Option(registry.get(name))
}
