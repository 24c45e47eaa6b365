package graft.delta

import java.util.UUID

/** Distributed-lock protocol for object stores without an atomic create-new
  * rename — the reference's DynamoDB lock client
  * (`rust/src/storage/s3/dynamodb_lock.rs:200-517`, adapted there from the
  * amazon-dynamodb-lock-client design and formally specified in
  * `tlaplus/dynamodblock.tla`), re-expressed against a pluggable
  * conditional-record backend so the protocol itself is testable without a
  * cloud: [[InMemoryLockBackend]] provides DynamoDB's conditional-put
  * semantics in-process; a production backend would target the real
  * DynamoDB conditional expressions 1:1.
  *
  * On local/HDFS filesystems commits are linearized by the filesystem's own
  * create-new primitive ([[LogStore.renameNoReplace]]) and no lock is
  * needed. On S3-class stores a commit must hold this lease around the
  * copy+verify+delete rename sequence; the lease carries the in-flight
  * rename (src, dst) as `data` so the NEXT holder can repair an interrupted
  * rename ([[LockingRename]], mirroring `rust/src/storage/s3/mod.rs:495-549`).
  */

/** A lease over the single lock record — the reference's `LockItem`
  * (`rust/src/storage/s3/mod.rs:440-466`).
  *
  * `recordVersionNumber` (RVN) is the compare-and-swap token: every write of
  * the record generates a fresh UUID, so a holder can prove the record is
  * unchanged since it last looked. `lookupTimeMillis` is LOCAL observation
  * time — expiry is judged by the observer's clock against the lease
  * duration, never by comparing machine clocks. */
final case class LockItem(
    ownerName: String,
    recordVersionNumber: String,
    leaseDurationSecs: Option[Long],
    isReleased: Boolean,
    data: Option[String],
    lookupTimeMillis: Long,
    acquiredExpiredLock: Boolean)

/** The reference's `LockClient` trait (`rust/src/storage/s3/mod.rs:472-490`). */
trait LockClient {
  /** One shot at the full acquire state machine; `None` = timed out or
    * transiently unable (retryable). */
  def tryAcquireLock(data: Option[String]): Option[LockItem]
  /** Current lock record (if any), stamped with local lookup time. */
  def getLock(): Option[LockItem]
  /** Replace the lease's repair data if still the holder; returns the lease
    * with a fresh RVN (extends the lease). Throws [[LockStolenException]]
    * when the lock changed hands. */
  def updateData(lock: LockItem, data: Option[String]): LockItem
  /** Delete the record if still the holder; false = someone stole it
    * (`release_lock`, dynamodb_lock.rs:353-377).
    *
    * CONTRACT — release must be conditional on RECORD IDENTITY (ownerName
    * + recordVersionNumber of `lock`), never on the lock name alone, and a
    * no-longer-held record must come back as `false`, not a throw. Callers
    * retry a THROWN release once (LockingRename): if the first call
    * released server-side but the response was lost, the retry must be a
    * no-op `false` — a by-name delete would instead remove a SUCCESSOR'S
    * live lease (r13 advice). The in-tree client satisfies this for every
    * backend: it routes through `deleteIfOwnerAndRvnMatch`, which
    * compares-and-deletes on the RVN the caller holds. */
  def releaseLock(lock: LockItem): Boolean
}

final class LockStolenException(owner: String)
  extends RuntimeException(s"lock no longer held by $owner")
final class LockTimedOutException(waitedMillis: Long)
  extends RuntimeException(s"could not acquire lock in $waitedMillis ms")

/** Clock + sleep seam so lease-expiry behavior is testable without real
  * waits (a fake clock advances on `sleep`). */
trait LockClock {
  def nowMillis: Long
  def sleep(ms: Long): Unit
}
object SystemLockClock extends LockClock {
  def nowMillis: Long = System.currentTimeMillis()
  def sleep(ms: Long): Unit = Thread.sleep(ms)
}

/** `Options` (dynamodb_lock.rs:28-46). Defaults match the reference. */
final case class LockOptions(
    ownerName: String = UUID.randomUUID().toString,
    leaseDurationSecs: Long = 20,
    refreshPeriodMillis: Long = 1000,
    additionalTimeToWaitMillis: Long = 1000)

/** The stored record — what DynamoDB holds between leases. `isReleased`
  * models the IS_RELEASED attribute (a record another client released
  * without deleting). */
final case class LockRecord(
    ownerName: String,
    recordVersionNumber: String,
    leaseDurationSecs: Option[Long],
    isReleased: Boolean,
    data: Option[String])

/** DynamoDB's single-record conditional-write surface — exactly the four
  * condition expressions the reference issues (`attribute_not_exists(pk)`,
  * `IS_RELEASED exists`, `RVN matches`, `OWNER and RVN match`; see
  * dynamodb_lock.rs `expressions` mod). Each op is atomic. */
trait LockBackend {
  def get(): Option[LockRecord]
  /** put with `attribute_not_exists(pk)` — new lock. */
  def putIfAbsent(r: LockRecord): Boolean
  /** put with `pk exists AND is_released` — take over a released record. */
  def putIfReleased(r: LockRecord): Boolean
  /** put with `pk exists AND rvn = expected` — take over an EXPIRED lock;
    * conditioning on the observed RVN makes the takeover race-safe. */
  def putIfRvnMatches(r: LockRecord, expectedRvn: String): Boolean
  /** put with `pk exists AND owner = o AND rvn = r` — extend own lease. */
  def putIfOwnerAndRvnMatch(r: LockRecord, owner: String, rvn: String): Boolean
  /** delete with `pk exists AND owner = o AND rvn = r` — release. */
  def deleteIfOwnerAndRvnMatch(owner: String, rvn: String): Boolean
}

/** In-process [[LockBackend]]: one synchronized record slot. The
  * concurrency-correctness burden sits in the PROTOCOL (RVN checks, expiry
  * by observer clock), which is exactly what this lets the spec exercise. */
final class InMemoryLockBackend extends LockBackend {
  private var record: Option[LockRecord] = None
  def get(): Option[LockRecord] = synchronized(record)
  def putIfAbsent(r: LockRecord): Boolean = synchronized {
    if (record.isEmpty) { record = Some(r); true } else false
  }
  def putIfReleased(r: LockRecord): Boolean = synchronized {
    if (record.exists(_.isReleased)) { record = Some(r); true } else false
  }
  def putIfRvnMatches(r: LockRecord, expectedRvn: String): Boolean = synchronized {
    if (record.exists(_.recordVersionNumber == expectedRvn)) { record = Some(r); true }
    else false
  }
  def putIfOwnerAndRvnMatch(r: LockRecord, owner: String, rvn: String): Boolean = synchronized {
    if (record.exists(x => x.ownerName == owner && x.recordVersionNumber == rvn)) {
      record = Some(r); true
    } else false
  }
  def deleteIfOwnerAndRvnMatch(owner: String, rvn: String): Boolean = synchronized {
    if (record.exists(x => x.ownerName == owner && x.recordVersionNumber == rvn)) {
      record = None; true
    } else false
  }
  /** Test seam: seed a record (e.g. a released one). */
  def seed(r: LockRecord): Unit = synchronized { record = Some(r) }
}

/** The reference's acquire state machine (`AcquireLockState`,
  * dynamodb_lock.rs:445-517) + client ops, over a [[LockBackend]]:
  *
  *  - no record → conditional-create wins the lock;
  *  - released record → conditional-replace wins it;
  *  - live record, first sighting → cache it, EXTEND the wait budget by its
  *    lease duration (a waiter must outwait a full lease), try later;
  *  - live record, same RVN as cached and lease expired by OUR clock →
  *    RVN-conditioned takeover, `acquiredExpiredLock = true`, and the new
  *    lease INHERITS the old `data` so the holder can repair the previous
  *    owner's interrupted rename;
  *  - live record, RVN changed → someone else won; re-cache, try later;
  *  - a non-expirable record (no lease duration) never times the waiter
  *    out (dynamodb_lock.rs:453-463).
  */
final class DynamoStyleLockClient(
    backend: LockBackend,
    val opts: LockOptions = LockOptions(),
    clock: LockClock = SystemLockClock) extends LockClient {

  private def isExpired(item: LockItem): Boolean =
    item.isReleased || item.leaseDurationSecs.exists(d =>
      clock.nowMillis - item.lookupTimeMillis > d * 1000)

  private def freshRecord(data: Option[String]): LockRecord =
    LockRecord(opts.ownerName, UUID.randomUUID().toString,
      Some(opts.leaseDurationSecs), isReleased = false, data)

  private def asItem(r: LockRecord, acquiredExpired: Boolean): LockItem =
    LockItem(r.ownerName, r.recordVersionNumber, r.leaseDurationSecs,
      r.isReleased, r.data, clock.nowMillis, acquiredExpired)

  override def getLock(): Option[LockItem] =
    backend.get().map(asItem(_, acquiredExpired = false))

  /** `acquire_lock` (dynamodb_lock.rs:267-287): poll every refresh period
    * until acquired or the (lease-extended) wait budget runs out. */
  def acquireLock(data: Option[String]): LockItem = {
    val started = clock.nowMillis
    var timeoutMillis = opts.additionalTimeToWaitMillis
    var cached: Option[LockItem] = None

    while (true) {
      val acquired: Option[LockItem] = getLock() match {
        case None =>
          val r = freshRecord(data)
          if (backend.putIfAbsent(r)) Some(asItem(r, acquiredExpired = false)) else None
        case Some(existing) if existing.isReleased =>
          val r = freshRecord(data)
          if (backend.putIfReleased(r)) Some(asItem(r, acquiredExpired = false)) else None
        case Some(existing) =>
          cached match {
            case None =>
              // first sighting: a fair waiter outlasts one full lease
              timeoutMillis += existing.leaseDurationSecs
                .getOrElse(opts.leaseDurationSecs) * 1000
              cached = Some(existing)
              None
            case Some(c) if c.recordVersionNumber == existing.recordVersionNumber =>
              if (isExpired(c)) {
                // takeover INHERITS the expired lease's data (repair context)
                val r = freshRecord(existing.data)
                if (backend.putIfRvnMatches(r, c.recordVersionNumber))
                  Some(asItem(r, acquiredExpired = true))
                else None
              } else None
            case Some(_) =>
              cached = Some(existing) // RVN moved: another worker holds it now
              None
          }
      }
      acquired match {
        case Some(item) => return item
        case None => ()
      }

      val nonExpirable = cached.exists(_.leaseDurationSecs.isEmpty)
      if (clock.nowMillis - started > timeoutMillis && !nonExpirable)
        throw new LockTimedOutException(clock.nowMillis - started)
      clock.sleep(opts.refreshPeriodMillis)
    }
    throw new IllegalStateException("unreachable")
  }

  override def tryAcquireLock(data: Option[String]): Option[LockItem] =
    try Some(acquireLock(data))
    catch { case _: LockTimedOutException => None }

  override def updateData(lock: LockItem, data: Option[String]): LockItem = {
    val r = freshRecord(data)
    if (backend.putIfOwnerAndRvnMatch(r, lock.ownerName, lock.recordVersionNumber))
      asItem(r, lock.acquiredExpiredLock)
    else throw new LockStolenException(lock.ownerName)
  }

  override def releaseLock(lock: LockItem): Boolean =
    backend.deleteIfOwnerAndRvnMatch(lock.ownerName, lock.recordVersionNumber)
}
