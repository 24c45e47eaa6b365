package graft.delta

import java.io.FileNotFoundException
import java.util.concurrent.atomic.AtomicReference

import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}

import scala.util.{Failure, Success, Try}

/** Commit rename for stores WITHOUT an atomic create-new: hold the
  * distributed lease around a non-atomic copy+delete, and let the next
  * lease holder repair an interrupted rename — the reference's
  * `rename_with_lock` (`rust/src/storage/s3/mod.rs:495-549`).
  *
  * Protocol per rename:
  *  1. acquire the lock with `data = {source, destination}` (the repair
  *     context), retrying `tryAcquireLock` up to the reference's 10k cap
  *     (mod.rs:492, 551-573);
  *  2. if the lease was taken over from an EXPIRED holder
  *     (`acquiredExpiredLock`), the inherited `data` describes THAT
  *     holder's in-flight rename: re-run it, tolerating AlreadyExists (the
  *     stale rename completed its copy — finish its delete half) and
  *     NotFound (it never started) — mod.rs:507-530 — then swap in our own
  *     data via `updateData` (fresh RVN, extended lease) and run our
  *     intended rename;
  *  3. while OUR copy runs, a heartbeat extends the lease every third of
  *     its duration — without it any rename slower than the lease (large
  *     checkpoint parts over a slow store) silently loses mutual
  *     exclusion mid-copy (r12 review find; the reference shares the gap
  *     and relies on lease ≫ copy time);
  *  4. release before surfacing the rename's outcome, so a failed rename
  *     never leaks a held lease (mod.rs:531-540). A DURABLY COMPLETED
  *     rename whose lease was stolen anyway returns success: the thief's
  *     repair re-ran the same byte-identical rename, and surfacing an
  *     error here would make [[OptimisticTransaction]] re-apply the same
  *     actions at a new version (double-commit — r12 review find; the
  *     reference errors here, we deliberately do not).
  */
object LockingRename {

  /** Non-atomic rename seam (S3-style copy-then-delete). Implementations
    * throw [[FileAlreadyExistsException]] when `dst` exists and
    * [[FileNotFoundException]] when `src` is missing — the two outcomes
    * repair tolerates. */
  trait UnsafeRenameOps {
    def unsafeRename(src: Path, dst: Path): Unit
    /** Best-effort removal of a repaired rename's leftover source (the
      * crashed holder copied but never deleted). Default no-op keeps
      * injection-test implementations source-compatible. */
    def deleteIfExists(path: Path): Unit = ()
  }

  /** Copy+delete over a [[LogStore]] — what `unsafe_rename_obj` does on S3
    * (`rust/src/storage/s3/mod.rs:388-398`). NOT atomic: a crash between
    * the write and the delete leaves both files, which is exactly the state
    * the lock's repair path exists for. */
  final class StoreRenameOps(store: LogStore) extends UnsafeRenameOps {
    override def unsafeRename(src: Path, dst: Path): Unit = {
      // rename endpoints are always single objects — the object-only check
      // spares object stores a directory-probe LIST per commit attempt
      if (store.existsObject(dst))
        throw new FileAlreadyExistsException(dst.toString)
      if (!store.existsObject(src)) throw new FileNotFoundException(src.toString)
      // byte-exact and (where the store supports it) streaming: checkpoint
      // parquet renames through this seam too, and buffering a multi-GB
      // part on the heap is an OOM (r12 review find)
      store.copy(src, dst)
      store.delete(src)
    }
    override def deleteIfExists(path: Path): Unit =
      if (store.existsObject(path)) store.delete(path)
  }

  /** The lock `data` payload (`LockData`, mod.rs:448-466). */
  final case class LockData(source: String, destination: String)

  private[delta] def toJson(d: LockData): String = {
    val n = ActionCodec.mapper.createObjectNode()
    n.put("source", d.source)
    n.put("destination", d.destination)
    ActionCodec.mapper.writeValueAsString(n)
  }

  private[delta] def fromJson(s: String): LockData = {
    val n = ActionCodec.mapper.readTree(s)
    require(n.hasNonNull("source") && n.hasNonNull("destination"),
      s"lock data is not a rename record: $s")
    LockData(n.get("source").asText(), n.get("destination").asText())
  }

  /** Reference cap on acquire retries (mod.rs:492). */
  val MaxAcquireAttempts: Int = 10000

  /** Extends the lease every `leaseDuration/3` while a long copy runs.
    * Runs on a daemon thread; a stolen lease stops it (the main thread
    * discovers the theft at release). `current` is the freshest lease
    * (every successful extension mints a new RVN). */
  private final class LeaseKeeper(client: LockClient, initial: LockItem,
                                  data: String) {
    private val ref = new AtomicReference[LockItem](initial)
    @volatile private var stopped = false
    private val periodMillis: Option[Long] =
      initial.leaseDurationSecs.map(d => math.max(d * 1000 / 3, 100L))
    private val thread: Option[Thread] = periodMillis.map { p =>
      val t = new Thread(() => {
        var stolen = false
        while (!stopped && !stolen) {
          try Thread.sleep(p)
          catch { case _: InterruptedException => () }
          if (!stopped) {
            try ref.set(client.updateData(ref.get(), Some(data)))
            catch {
              case _: LockStolenException => stolen = true // theft surfaces at release
              case scala.util.control.NonFatal(_) => () // transient; retry next tick
            }
          }
        }
      }, "graft-lease-keeper")
      t.setDaemon(true)
      t.start()
      t
    }
    def stop(): LockItem = {
      stopped = true
      thread.foreach { t => t.interrupt(); t.join(2000) }
      ref.get()
    }
  }

  def rename(ops: UnsafeRenameOps, client: LockClient, src: Path, dst: Path): Unit = {
    val myData = toJson(LockData(src.toString, dst.toString))
    var lock = acquireLoop(client, myData)

    if (lock.acquiredExpiredLock) {
      // The inherited `data` describes the PREVIOUS holder's in-flight
      // rename. Absent or unparsable data (a foreign client's record)
      // means there is nothing we can interpret to repair: skip instead of
      // throwing with the lease held — the updateData below replaces the
      // poison payload, so one bad record cannot livelock every future
      // taker through a full lease-wait each (r12 review find).
      lock.data.flatMap(d => Try(fromJson(d)).toOption).foreach { repair =>
        Try(ops.unsafeRename(new Path(repair.source), new Path(repair.destination))) match {
          case Failure(_: FileAlreadyExistsException) =>
            // stale rename had copied: finish its delete half, or the
            // crashed holder's source file orphans in _delta_log forever
            // (no cleanup regex ever matches it — r12 review find)
            Try(ops.deleteIfExists(new Path(repair.source)))
          case Failure(_: FileNotFoundException) => () // stale rename never started
          case Failure(e) => throw e // repair failed hard; keep lease for the next repair
          case Success(()) => ()
        }
      }
      // now do OUR rename under a refreshed lease
      lock = client.updateData(lock, Some(myData))
    }

    val keeper = new LeaseKeeper(client, lock, myData)
    val renameResult =
      try Try(ops.unsafeRename(src, dst))
      finally lock = keeper.stop()

    // Release first, then surface the rename outcome (mod.rs:531-540). A
    // failed release after a SUCCESSFUL rename is deliberately not an
    // error: the lease was stolen mid-copy yet our rename durably
    // completed (the thief replayed the identical bytes) — see the
    // scaladoc for why throwing here risks a double-commit. But a
    // TRANSIENT release failure on a healthy lease would leak it until
    // expiry, taxing every subsequent writer a full lease-wait with no
    // signal why — retry once, then at least say so (r12 ADVICE).
    // (a `false` return — stolen lease — stays silent: that IS the
    // anticipated benign case; only a THROWN release is the leak)
    // The immediate retry is safe ONLY under LockClient.releaseLock's
    // identity contract: release compares-and-deletes on the RVN we hold,
    // so a first call that released server-side but threw on the response
    // makes the retry a no-op `false` — never a delete of a successor's
    // lease (r13 advice; contract documented on the trait).
    Try(client.releaseLock(lock)).recoverWith { case first =>
      Try(client.releaseLock(lock)).recoverWith { case _ =>
        System.err.println(
          s"graft: releaseLock failed twice for owner ${lock.ownerName} " +
          s"(${first.getClass.getSimpleName}: ${first.getMessage}); " +
          "lease leaks until expiry — subsequent writers pay a lease-wait")
        Failure(first)
      }
    }
    renameResult.get
  }

  private def acquireLoop(client: LockClient, data: String): LockItem = {
    var attempts = 0
    while (attempts < MaxAcquireAttempts) {
      client.tryAcquireLock(Some(data)) match {
        case Some(l) => return l
        case None => attempts += 1
      }
    }
    throw new IllegalStateException(s"cannot acquire lock after $MaxAcquireAttempts attempts")
  }
}
