package graft.delta

/** Distributed-lock seam for object stores without an atomic create-new
  * rename — the interface of the reference's DynamoDB lock client
  * (`rust/src/storage/s3/mod.rs:472-490`; implementation
  * `rust/src/storage/s3/dynamodb_lock.rs`, formally specified in
  * `tlaplus/dynamodblock.tla`).
  *
  * On local/HDFS filesystems commits are linearized by the filesystem's own
  * create-new primitive ([[LogStore.renameNoReplace]]) and no lock is
  * needed. On S3-class stores, a commit must hold an external lease around
  * the copy+verify+delete rename sequence; the reference's lease carries the
  * destination path as `data` so an interrupted rename can be *repaired* by
  * the next lock holder (`rust/src/storage/s3/mod.rs:507-530`).
  *
  * Out of scope for the local milestone — documented so the write path has
  * a single, testable seam to plug a cloud implementation into.
  */
trait LockClient {

  /** Lease held by a single writer; `rvn` is the record-version-number used
    * for compare-and-swap semantics, `data` carries repair context (the
    * in-flight rename destination). */
  final case class Lock(rvn: String, owner: String, data: Option[String],
                        acquiredAtMillis: Long, expiresAtMillis: Long)

  /** Acquire (blocking up to the client's configured wait): a lock is
    * grantable when absent, released, or expired — matching
    * `try_acquire_lock` (`rust/src/storage/s3/dynamodb_lock.rs:267-287`). */
  def acquire(data: Option[String]): Lock

  /** Release if still the owner; returns false when the lease was lost.
    * (`rust/src/storage/s3/dynamodb_lock.rs:353-377`) */
  def release(lock: Lock): Boolean

  /** Current lock state, for repair of interrupted renames. */
  def peek(): Option[Lock]
}
