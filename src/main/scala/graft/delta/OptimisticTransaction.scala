package graft.delta

import java.util.UUID
import scala.collection.mutable

import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}

final class CommitConflictException(attempts: Int)
  extends RuntimeException(s"commit failed after $attempts attempts (version conflicts)")

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
  * Conflict semantics are blind-retry, as in the reference (semantic
  * conflict resolution is its open TODO, `rust/src/delta.rs:1306-1322`).
  */
final class OptimisticTransaction(val log: DeltaLog) {

  private val actions = mutable.Buffer[Action]()

  /** `add_action` / `add_actions` (`rust/src/delta.rs:1215-1224`). */
  def addAction(a: Action): this.type = { actions += a; this }
  def addActions(as: Seq[Action]): this.type = { actions ++= as; this }

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
    val tmp = prepareCommit(operation.toSeq)
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val target = log.latestVersion() + 1
      try {
        log.store.renameNoReplace(tmp, log.commitFile(target))
        log.update()
        return target
      } catch {
        case _: FileAlreadyExistsException => () // lost the race; retry at next version
      }
    }
    log.store.delete(tmp)
    throw new CommitConflictException(maxAttempts)
  }
}

object OptimisticTransaction {
  /** Reference default retry budget (`rust/src/delta.rs:1158`). */
  val MaxRetryCommitAttempts: Int = 10000000
}
