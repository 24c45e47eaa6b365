package graft.delta

import java.util.UUID
import scala.collection.mutable

import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}

final class CommitConflictException(attempts: Int)
  extends RuntimeException(s"commit failed after $attempts attempts (version conflicts)")

/** A concurrent commit invalidated this transaction; retrying at the next
  * version would be semantically wrong, so the commit aborts. The caller's
  * remedy is to re-read the table and redo the operation. */
sealed abstract class ConcurrentCommitException(msg: String)
  extends RuntimeException(msg)
/** A concurrent commit changed the table's metadata or protocol. */
final class MetadataChangedException(version: Long)
  extends ConcurrentCommitException(
    s"concurrent commit $version changed table metadata/protocol")
/** A concurrent commit appended data a file-rewriting transaction
  * (DELETE/UPDATE/MERGE/overwrite) did not see. */
final class ConcurrentAppendException(version: Long)
  extends ConcurrentCommitException(
    s"concurrent commit $version appended data this rewrite did not see")
/** A concurrent commit removed a file this transaction also removes. */
final class ConcurrentDeleteDeleteException(version: Long, path: String)
  extends ConcurrentCommitException(
    s"concurrent commit $version also removed $path")
/** A concurrent commit wrote the same metadata domain this transaction
  * writes — last-writer-wins inside a domain is a lost update, so the
  * loser aborts (writes to DIFFERENT domains commute). */
final class ConcurrentDomainMetadataException(version: Long, domain: String)
  extends ConcurrentCommitException(
    s"concurrent commit $version also wrote metadata domain '$domain'")
/** A concurrent commit recorded a `txn` action for the same appId this
  * transaction records — the streaming sink's exactly-once gate is a
  * read-then-commit on `appTransactionVersion`, so a racing epoch writer
  * must abort and RE-CHECK, never retry blindly: two drivers finishing
  * the same epoch would otherwise both commit it (delta-spark's
  * ConcurrentTransactionException; r12 review). */
final class ConcurrentTransactionException(version: Long, appId: String)
  extends ConcurrentCommitException(
    s"concurrent commit $version also recorded a txn for appId '$appId'")
/** The table's current TxnAction mark for an appId is not what the caller
  * required (GraftWriter `requireAppVersion`): a concurrent incremental
  * maintainer already advanced (or regressed) the mark — re-read the mark
  * and fold from there instead of double-applying a window. */
final class StaleAppVersionException(appId: String, expected: Long,
                                     found: Option[Long])
  extends ConcurrentCommitException(
    s"txn mark for appId '$appId' is $found, expected Some($expected) — " +
    "a concurrent maintainer moved it; re-read and retry")
/** The table is configured `delta.appendOnly=true` and this transaction
  * carries a data-changing remove. */
final class AppendOnlyTableException(path: String)
  extends IllegalStateException(
    s"table $path is append-only (${TableConfig.AppendOnly}=true): " +
    "DELETE/UPDATE/MERGE/overwrite are not allowed")

/** Optimistic-concurrency transaction — the reference's `DeltaTransaction`
  * (`rust/src/delta.rs:986-1416`):
  *
  *  1. accumulate actions (`add_action`, :1215-1224);
  *  2. `prepareCommit` serializes them as newline JSON to
  *     `_delta_log/_commit_<uuid>.json` (:1335-1357);
  *  3. `tryCommitLoop` (:1359-1397): refresh, candidate version =
  *     latest + 1, atomic create-new rename to `%020d.json`
  *     (`try_commit_transaction`, :998-1014); `AlreadyExists` ⇒ another
  *     writer won that version ⇒ retry with the next one.
  *
  * Retries are **semantically checked** (the reference leaves this as its
  * open TODO, `rust/src/delta.rs:1306-1322`, and blind-retries): every
  * version committed after this transaction's read snapshot is classified
  * before we attempt (or re-attempt) the rename —
  *
  *  - a concurrent metadata/protocol change aborts any transaction
  *    ([[MetadataChangedException]]);
  *  - two transactions removing the same file abort the loser
  *    ([[ConcurrentDeleteDeleteException]]) — the file is already gone;
  *  - a concurrent `dataChange` append aborts a transaction carrying
  *    `dataChange` removes OR one that declared a read domain
  *    ([[ConcurrentAppendException]]): a predicate rewrite
  *    (DELETE/UPDATE/MERGE/overwrite) did not see the new rows. The
  *    declared-read arm closes the r11 storm-found write skew: an
  *    INSERT-ONLY merge stages no removes, yet its not-matched decision
  *    was computed against a snapshot the concurrent append invalidates —
  *    two such merges would otherwise both insert the same key.
  *    When the rewrite declared a partition-scoped read domain
  *    ([[withReadFilters]]), only adds whose `partitionValues` fall INSIDE
  *    that domain conflict — partition-disjoint DMLs and appends commute,
  *    which is what keeps many-writer throughput alive at scale (Delta's
  *    winning-commit check at partition granularity). No declared domain ⇒
  *    conservative whole-table semantics, never wrong.
  *    Compactions (`dataChange=false` removes) commute with appends, so
  *    OPTIMIZE never blocks writers and vice versa — only an overlap of
  *    removed files conflicts it.
  *
  * Append-only transactions therefore retry freely (appends commute), and
  * the check reads only the commits that actually raced (O(contention),
  * not O(log)).
  */
final class OptimisticTransaction(val log: DeltaLog,
                                  pinned: Option[Snapshot] = None) {

  /** The snapshot this transaction's view of the table is based on —
    * captured once at construction so commit-time decisions (coordinator
    * routing, the adoption-mark fast path) are made against the SAME state
    * the conflict check classifies from, not whatever `log.snapshot`
    * happens to hold at commit time (r13 advice).
    *
    * `pinned` (r17, forced by the shared-handle cache): a writer that
    * PLANS against a snapshot — computes removes, CDF images, a rewrite,
    * a metadata evolution — must pin THAT snapshot here, via
    * [[DeltaLog.startTransaction(pinned*]]. With per-call handles the
    * `log.snapshot` fallback was equivalent (nothing could advance a
    * private handle); with shared handles a concurrent same-JVM commit can
    * advance the cache between the planning read and transaction start,
    * and the conflict window `(readVersion, latest]` would then SKIP the
    * very commit the plan raced — a lost update (caught by DmlStormSpec
    * seed 4: a concurrent rewrite resurrected three deleted rows). */
  private val readSnapshot: Snapshot = pinned.getOrElse(log.snapshot)

  /** The version this transaction's view of the table is based on. */
  private val readVersion: Long = readSnapshot.version
  private var checkedThrough: Long = readVersion

  /** Partition-level projection of this transaction's read predicate.
    * `None` = domain unknown (whole table). `Some(Nil)` = a predicate was
    * declared but constrains no partition column — still the whole table. */
  private var readFilters: Option[Seq[PartitionFilter]] = None

  /** Declare the partitions this transaction read (see
    * [[PartitionFilter.fromCatalyst]]); called by DML before commit. */
  def withReadFilters(filters: Seq[PartitionFilter]): this.type = {
    readFilters = Some(filters)
    this
  }

  private val actions = mutable.Buffer[Action]()

  /** `add_action` / `add_actions` (`rust/src/delta.rs:1215-1224`). */
  def addAction(a: Action): this.type = { actions += a; this }
  def addActions(as: Seq[Action]): this.type = { actions ++= as; this }

  private val appVersionRequirements = mutable.Buffer[(String, Long)]()

  /** Refuse this transaction unless the table's TxnAction mark for `appId`
    * is exactly `version` in THIS transaction's read snapshot. The guarantee
    * is two-legged: this check covers marks at or below `readVersion`, and a
    * competing mark landing above it trips the same-appId
    * [[ConcurrentTransactionException]] in the conflict check — provided
    * this commit ALSO carries a TxnAction for the appId ([[commit]]
    * enforces that). Checking any OTHER snapshot (e.g. a caller-side
    * `log.update()` taken before a long staging job) leaves a gap: a
    * concurrent same-JVM committer can advance the shared snapshot cache
    * between that check and `startTransaction()`, and its mark lands below
    * our readVersion where the conflict check never looks (r15 advice).
    * May be called once per appId — independent marks compose (e.g. a
    * progress mark plus a layout epoch). */
  def requireAppVersion(appId: String, version: Long): this.type = {
    val cur = readSnapshot.appTransactionVersion.get(appId)
    if (!cur.contains(version))
      throw new StaleAppVersionException(appId, version, cur)
    appVersionRequirements += ((appId, version))
    this
  }

  private var allowNameMapping = false

  /** Declare that this transaction's data files were staged under the
    * table's PHYSICAL column names ([[ColumnMapping.toPhysical]]), lifting
    * the commit fence's column-mapping refusal for mode=name tables. */
  private[graft] def permitNameMappedCommit(): this.type = {
    allowNameMapping = true
    this
  }

  /** Serialize buffered actions to a uniquely-named temp commit file in the
    * log dir — `prepare_commit` (`rust/src/delta.rs:1335-1357`). */
  private[delta] def prepareCommit(extraInfo: Seq[Action]): Path = {
    val tmp = new Path(log.logPath, s"_commit_${UUID.randomUUID()}.json")
    log.store.mkdirs(log.logPath)
    log.store.write(tmp, ActionCodec.logEntry(extraInfo ++ actions.toSeq))
    tmp
  }

  /** Commit and return the new version. `operation` becomes a `commitInfo`
    * line (`DeltaOperation`, `rust/src/action.rs:779-803`). */
  def commit(operation: Option[CommitInfoAction] = None,
             maxAttempts: Int = OptimisticTransaction.MaxRetryCommitAttempts): Long = {
    // protocol capability fence: refuse to write a table whose invariants
    // graft would not maintain (fresh tables have version -1 / writer 0 and
    // pass trivially; a same-commit protocol bump is graft's own and exempt)
    ProtocolSupport.assertWritable(log.snapshot, allowNameMapping)
    // requireAppVersion's second leg needs the conflict rule armed: without
    // a same-appId TxnAction in THIS commit, a competing mark landing during
    // the retry loop is not conflict-classified and the precondition is
    // silently void (r14 third review pass)
    appVersionRequirements.foreach { case (app, _) =>
      require(actions.exists {
          case t: TxnAction => t.appId == app
          case _ => false
        },
        s"requireAppVersion('$app') needs a same-appId TxnAction in this " +
        "commit — without it a competing mark landing during the commit " +
        "retry loop is not conflict-classified")
    }
    // delta.appendOnly gate — the effective config is the one this commit
    // leaves behind (a same-commit metaData wins over the read snapshot's).
    val effectiveConfig = actions.reverseIterator
      .collectFirst { case m: MetaDataAction => m.configuration }
      .getOrElse(TableConfig.of(log.snapshot))
    if (TableConfig.appendOnly(effectiveConfig) && actions.exists {
          case r: RemoveAction => r.dataChange
          case _ => false
        })
      throw new AppendOnlyTableException(log.tablePath.toString)
    // In-commit timestamps: when the config this commit leaves behind
    // enables them, the commit file must LEAD with a commitInfo carrying a
    // monotonic `inCommitTimestamp` — and the clock depends on the version
    // we race for, so the temp file is (re)written per candidate version
    // instead of once up front.
    val ictEnabled = TableConfig.inCommitTimestampsEnabled(effectiveConfig)
    val ictEnablement = ictEnabled &&
      !TableConfig.inCommitTimestampsEnabled(TableConfig.of(log.snapshot))
    // Row tracking: new files' defaultRowCommitVersion = the version this
    // commit LANDS at — also stamped per candidate version. The effective
    // feature set is what the commit leaves behind (a same-commit protocol
    // action wins over the read snapshot's).
    val effectiveWriterFeatures = actions.reverseIterator
      .collectFirst { case p: ProtocolAction => p.writerFeatures }
      .getOrElse(log.snapshot.writerFeatures)
    val rtStamp = effectiveWriterFeatures.exists(_.contains(RowTracking.Feature)) &&
      actions.exists {
        case a: AddAction => a.defaultRowCommitVersion.isEmpty
        case _ => false
      }
    val perVersionStamp = ictEnabled || rtStamp
    // Coordinated-commits routing comes from the READ snapshot
    // ([[CoordinatedCommits]]): the ENABLEMENT commit (snapshot not yet
    // coordinated) still goes through the filesystem rename; every commit
    // after — including the DISABLEMENT commit, which must leave the log
    // fully backfilled or the next filesystem writer would re-claim an
    // un-backfilled version and fork history — goes through the
    // coordinator.
    val coordinated = CoordinatedCommits.clientForWrite(readSnapshot)
    val disabling = coordinated.isDefined &&
      !CoordinatedCommits.isCoordinated(effectiveConfig)
    var tmp: Path = if (perVersionStamp) null else prepareCommit(operation.toSeq)
    var tmpFor = Long.MinValue
    var lastIct = 0L
    val ourRemoves = actions.collect { case r: RemoveAction => r.path }.toSet
    val ourDomains = actions.collect { case d: DomainMetadataAction => d.domain }.toSet
    val ourTxnApps = actions.collect { case t: TxnAction => t.appId }.toSet
    val ourDataChangeRemoves = actions.exists {
      case r: RemoveAction => r.dataChange
      case _ => false
    }
    var attempt = 0
    var healedStaged = false
    while (attempt < maxAttempts) {
      attempt += 1
      val latest = coordinated match {
        case Some((client, tconf)) =>
          // the coordinator's view bounds the filesystem's: staged commits
          // it still tracks must be visible to the conflict check below
          val (pending, coordLatest) =
            client.getCommits(log.logPath.toString, tconf)
          log.registerStaged(pending)
          val fsLatest = log.latestVersion()
          if (coordLatest < fsLatest) {
            // The coordinator lags the filesystem: the enablement window
            // (the post-commit re-registration never ran) or a fresh/
            // recovered coordinator (-1). Every version ≤ fsLatest is
            // durably on the filesystem, so re-seeding there is safe —
            // and without it the coordinator rejects every proposal
            // forever, an unwinnable conflict-retry loop (r12 review
            // find). `pending` is empty in this state (tracked commits
            // never trail the coordinator's own latest). A state-LOST
            // coordinator may additionally strand acked staged-only
            // commits ABOVE fsLatest: adopt them (single candidate) or
            // refuse (ambiguous) before re-seeding — a re-seed at bare
            // fsLatest would hand their versions to new commits and fork
            // acked history (r12 review). latestVersion() merges this
            // handle's OWN staged map, so heal those to classic names
            // first — otherwise a warm handle re-seeds the new coordinator
            // PAST map-known staged-only versions nothing will ever
            // backfill (r12 second-pass review).
            log.repairStagedGaps()
            // readSnapshot is coordinated here (clientForWrite above), so
            // the adoption-mark fast path is vacuous and the full scan runs
            val tip = log.adoptStagedTail(fsLatest, readSnapshot)
            client.registerTable(log.logPath.toString, tip)
            math.max(tip, coordLatest)
          } else math.max(fsLatest, coordLatest)
        case None => log.latestVersion()
      }
      try {
        // classify every commit that landed since our read snapshot before
        // (re-)attempting; an incompatible winner aborts instead of retrying
        while (checkedThrough < latest) {
          checkedThrough += 1
          checkConflict(checkedThrough, ourRemoves, ourDataChangeRemoves,
            ourDomains, ourTxnApps)
        }
        if (perVersionStamp && tmpFor != latest) {
          if (tmp != null) log.store.delete(tmp)
          val (t, ict) = prepareStampedCommit(operation, latest,
            ictEnabled, ictEnablement, rtStamp)
          tmp = t
          lastIct = ict
          tmpFor = latest
        }
        coordinated match {
          case Some((client, tconf)) =>
            // stage under a race-proof UUID name, then CLAIM the version at
            // the coordinator — ITS accept/reject is the linearization
            // point that replaces the rename
            val staged = new Path(log.commitsDir,
              CoordinatedCommits.stagedName(latest + 1))
            log.store.mkdirs(log.commitsDir)
            // atomic copy (r12): a state-loss recovery's adoption scan can
            // list this file BEFORE we propose it — streaming bytes
            // straight in would let it promote a torn commit to a classic
            // name. copy() publishes complete-or-absent (and never buffers
            // the payload on the heap).
            log.store.copy(tmp, staged)
            val cc = CoordinatedCommit(latest + 1, staged.getName,
              System.currentTimeMillis())
            val adoptedWin =
              try { client.commit(log.logPath.toString, tconf, cc); false }
              catch {
                case e: CommitVersionConflictException =>
                  // a state-loss recovery racing this proposal may have
                  // ADOPTED our staged file as the version's winner before
                  // the re-seeded coordinator heard our claim — if the
                  // classic copy is byte-identical to our staged file, this
                  // commit IS durably applied; retrying would apply the
                  // same actions twice (r12 second-pass review)
                  val classic = log.commitFile(latest + 1)
                  val ours =
                    try log.store.exists(classic) &&
                      log.store.read(classic) == log.store.read(staged)
                    catch { case scala.util.control.NonFatal(_) => false }
                  if (!ours) {
                    log.store.delete(staged) // our staged file lost the race
                    // surface on the same lost-the-race retry path as the
                    // filesystem primitive
                    throw new FileAlreadyExistsException(e.getMessage)
                  }
                  true
              }
            log.registerStaged(Seq(cc))
            log.store.delete(tmp)
            if (!adoptedWin && (disabling || client.backfillInterval <= 1 ||
                (latest + 1) % client.backfillInterval == 0))
              // The commit is DURABLE at the coordinator from this point:
              // a backfill failure must not surface as a failed write —
              // the caller would retry the whole operation and apply it
              // twice (r12 review). Backfill is idempotent and re-run by
              // any later interval commit; a failed DISABLEMENT backfill
              // is finished by the next filesystem-mode writer's
              // repairStagedGaps before it can fork the classic log.
              try CoordinatedCommits.backfill(log, client, tconf)
              catch {
                case scala.util.control.NonFatal(e) =>
                  System.err.println(s"graft: backfill of ${log.tablePath} " +
                    s"failed after durable commit ${latest + 1} (will be " +
                    s"re-attempted by a later writer): $e")
              }
          case None =>
            // staged commits from a disabled coordinated era whose
            // backfill never finished: claim their classic names FIRST —
            // renaming latest+1 past them would leave a permanent gap.
            // repairStagedGaps covers what this handle tracked; the
            // fs-level adoption covers a fresh process whose coordinator
            // lost state (nothing to track). An adoption landing exactly
            // on latest+1 surfaces as AlreadyExists → normal retry. Once
            // per commit call: the gap state is static while this commit
            // runs (a new coordinated era is a metadata change that
            // aborts this transaction), so retry attempts skip the probe.
            if (!healedStaged) {
              log.repairStagedGaps()
              // every commit in (readSnapshot.version, latest] has been
              // conflict-classified above (a metadata change — the only way
              // a new era starts — threw before reaching here), which is
              // exactly the fast-path precondition adoptStagedTail states
              log.adoptStagedTail(latest, readSnapshot)
              healedStaged = true
            }
            log.store.renameNoReplace(tmp, log.commitFile(latest + 1))
        }
        // we minted this version's clock — no need to re-read the file
        if (ictEnabled) log.cacheIct(latest + 1, lastIct)
        val profSb =
          if (GraftWriter.commitProf) new StringBuilder("GRAFTPROF txn") else null
        var profT = GraftWriter.profMark()
        val updated = log.update()
        profT = GraftWriter.profNote(profSb, "post_update", profT)
        // advisory per-version checksum (delta-spark's .crc convention);
        // written only when the refresh landed exactly on our commit (a
        // concurrent later commit makes ITS committer responsible)
        if (updated.version == latest + 1) Checksum.write(log, updated)
        if (GraftWriter.commitProf) {
          GraftWriter.profNote(profSb, "checksum", profT)
          System.err.println(profSb)
        }
        OptimisticTransaction.committedCount.incrementAndGet()
        return latest + 1
      } catch {
        case _: FileAlreadyExistsException => () // lost the race; re-check and retry
        case e: Throwable =>
          // ConcurrentCommitException, adoption-ambiguity refusal, hard
          // IO failures: the prepared _commit_<uuid>.json matches no
          // retention rule and would sit in _delta_log forever (r12
          // second-pass review — previously only ConcurrentCommitException
          // reclaimed it)
          if (tmp != null)
            try log.store.delete(tmp)
            catch { case scala.util.control.NonFatal(_) => () }
          throw e
      }
    }
    if (tmp != null) log.store.delete(tmp)
    throw new CommitConflictException(maxAttempts)
  }

  /** Temp commit file for candidate version `latest + 1` carrying the
    * per-version stamps:
    *
    *  - under ICT, a leading commitInfo stamped `inCommitTimestamp =
    *    max(now, prev + 1)` (strict monotonicity per the protocol — clock
    *    skew between writers must not let history run backwards), with
    *    the ENABLEMENT commit recording its own version/timestamp in the
    *    metaData provenance keys;
    *  - under row tracking, `defaultRowCommitVersion = latest + 1` on
    *    every add that does not already carry one (re-adds keep theirs).
    */
  private def prepareStampedCommit(operation: Option[CommitInfoAction],
                                   latest: Long,
                                   ictEnabled: Boolean, enablement: Boolean,
                                   rtStamp: Boolean): (Path, Long) = {
    val now = System.currentTimeMillis()
    val prev =
      if (ictEnabled && latest >= 0) log.inCommitTimestampOf(latest) else None
    val ict = math.max(now, prev.map(_ + 1L).getOrElse(now))
    val head: Seq[Action] =
      if (!ictEnabled) operation.toSeq
      else {
        val info = operation
          .map(_.info.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]())
          .getOrElse {
            val o = ActionCodec.mapper.createObjectNode()
            o.put("timestamp", now)
            o
          }
        info.put("inCommitTimestamp", ict)
        Seq(CommitInfoAction(info))
      }
    val body: Seq[Action] = actions.toSeq.map {
      case m: MetaDataAction
          if enablement && TableConfig.inCommitTimestampsEnabled(m.configuration) =>
        m.copy(configuration = m.configuration ++ Map(
          TableConfig.IctEnablementVersion -> (latest + 1).toString,
          TableConfig.IctEnablementTimestamp -> ict.toString))
      case a: AddAction if rtStamp && a.defaultRowCommitVersion.isEmpty =>
        a.copy(defaultRowCommitVersion = Some(latest + 1))
      case a => a
    }
    val tmp = new Path(log.logPath, s"_commit_${UUID.randomUUID()}.json")
    log.store.mkdirs(log.logPath)
    log.store.write(tmp, ActionCodec.logEntry(head ++ body))
    (tmp, ict)
  }

  private def checkConflict(version: Long, ourRemoves: Set[String],
                            ourDataChangeRemoves: Boolean,
                            ourDomains: Set[String],
                            ourTxnApps: Set[String]): Unit =
    log.readCommit(version).foreach {
      case _: MetaDataAction | _: ProtocolAction =>
        throw new MetadataChangedException(version)
      case r: RemoveAction if ourRemoves.contains(r.path) =>
        throw new ConcurrentDeleteDeleteException(version, r.path)
      case a: AddAction if a.dataChange &&
          (ourDataChangeRemoves || readFilters.isDefined) && addInReadDomain(a) =>
        throw new ConcurrentAppendException(version)
      case d: DomainMetadataAction if ourDomains.contains(d.domain) =>
        throw new ConcurrentDomainMetadataException(version, d.domain)
      case t: TxnAction if ourTxnApps.contains(t.appId) =>
        throw new ConcurrentTransactionException(version, t.appId)
      case _ => () // appends/compactions/disjoint partitions/domains commute
    }

  /** Could the concurrent add's rows have matched our read predicate?
    * Unknown domain or an empty filter list ⇒ yes (whole-table read). */
  private def addInReadDomain(a: AddAction): Boolean = readFilters match {
    case Some(fs) if fs.nonEmpty => fs.forall(_.matches(a.partitionValues))
    case _ => true
  }
}

object OptimisticTransaction {
  /** Reference default retry budget (`rust/src/delta.rs:1158`). */
  val MaxRetryCommitAttempts: Int = 10000000

  /** Process-wide committed-transaction counter (monotone, incremented at
    * the single success point of [[OptimisticTransaction.commit]]). Bench
    * samples per-query deltas so per-commit fixed-cost ("commit floor")
    * inflation is mechanically separable from plan-time regressions in the
    * bench record (r16 verdict #4 — a 4.6× wall flip on untouched DML code
    * took a round of forensics that a commit count would have closed). */
  val committedCount = new java.util.concurrent.atomic.AtomicLong(0L)
}
