package graft.delta

import java.io.FileNotFoundException

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
  *     stale rename completed its copy) and NotFound (it never started) —
  *     mod.rs:507-530 — then swap in our own data via `updateData` (fresh
  *     RVN, extended lease) and run our intended rename;
  *  3. release before surfacing the rename's outcome, so a failed rename
  *     never leaks a held lease (mod.rs:531-540).
  */
object LockingRename {

  /** Non-atomic rename seam (S3-style copy-then-delete). Implementations
    * throw [[FileAlreadyExistsException]] when `dst` exists and
    * [[FileNotFoundException]] when `src` is missing — the two outcomes
    * repair tolerates. */
  trait UnsafeRenameOps {
    def unsafeRename(src: Path, dst: Path): Unit
  }

  /** Copy+delete over a [[LogStore]] — what `unsafe_rename_obj` does on S3
    * (`rust/src/storage/s3/mod.rs:388-398`). NOT atomic: a crash between
    * the write and the delete leaves both files, which is exactly the state
    * the lock's repair path exists for. */
  final class StoreRenameOps(store: LogStore) extends UnsafeRenameOps {
    override def unsafeRename(src: Path, dst: Path): Unit = {
      if (store.exists(dst)) throw new FileAlreadyExistsException(dst.toString)
      if (!store.exists(src)) throw new FileNotFoundException(src.toString)
      // byte-exact: checkpoint parquet renames through this seam too
      store.writeBytes(dst, store.readBytes(src))
      store.delete(src)
    }
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

  def rename(ops: UnsafeRenameOps, client: LockClient, src: Path, dst: Path): Unit = {
    val myData = toJson(LockData(src.toString, dst.toString))

    var lock = acquireLoop(client, myData)
    val lockData = lock.data.getOrElse(
      throw new IllegalStateException("acquired lock with no lock data"))
    val repair = fromJson(lockData)

    var renameResult: Try[Unit] =
      Try(ops.unsafeRename(new Path(repair.source), new Path(repair.destination)))

    if (lock.acquiredExpiredLock) {
      // the rename above replayed the PREVIOUS holder's interrupted rename
      renameResult match {
        case Failure(_: FileAlreadyExistsException) => () // stale rename had copied
        case Failure(_: FileNotFoundException) => ()      // stale rename never started
        case Failure(e) => throw e // repair failed hard; keep lease for the next repair
        case Success(()) => ()
      }
      // now do OUR rename under a refreshed lease
      lock = client.updateData(lock, Some(myData))
      renameResult = Try(ops.unsafeRename(src, dst))
    }

    // release first, then surface the rename outcome (mod.rs:531-540)
    val released = Try(client.releaseLock(lock))
    renameResult.get
    if (!released.getOrElse(false))
      throw new IllegalStateException("lock was not released (lease stolen?)")
  }

  private def acquireLoop(client: LockClient, data: String): LockItem = {
    var attempts = 0
    while (attempts <= MaxAcquireAttempts) {
      client.tryAcquireLock(Some(data)) match {
        case Some(l) => return l
        case None => attempts += 1
      }
    }
    throw new IllegalStateException(s"cannot acquire lock after $MaxAcquireAttempts attempts")
  }
}
