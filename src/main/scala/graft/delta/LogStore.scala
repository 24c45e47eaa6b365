package graft.delta

import java.io.{FileNotFoundException, IOException}
import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException => NioExists, Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Storage seam for the transaction log — the role of the reference's
  * `StorageBackend` trait (`rust/src/storage/mod.rs:372-427`): head/get/list/
  * put/delete plus an **atomic create-new rename**, whose contract (fail with
  * AlreadyExists when the destination exists; `rust/src/storage/mod.rs:416-423`)
  * is what makes optimistic commits linearizable.
  */
trait LogStore {

  /** List statuses directly under `dir`, sorted by path; empty if missing. */
  def list(dir: Path): Seq[FileStatus]

  def exists(path: Path): Boolean

  /** [[exists]] when the caller KNOWS `path` names a single object, never
    * a directory/prefix — the rename seam's per-commit dst/src checks.
    * Object stores override to skip the directory-probe fallback
    * (on S3 that is a ListObjectsV2 per 404'd HEAD, ~10× GET pricing on
    * the hottest path in the engine). Default: plain [[exists]]. */
  def existsObject(path: Path): Boolean = exists(path)

  def fileStatus(path: Path): FileStatus

  /** Read a whole UTF-8 text file. */
  def read(path: Path): String

  def readLines(path: Path): Iterator[String] =
    read(path).linesIterator

  /** Write a UTF-8 text file, overwriting (for non-commit artifacts like
    * `_last_checkpoint`). */
  def write(path: Path, content: String): Unit

  /** Byte-exact read/write — checkpoint parquet moves through the rename
    * seam too, so a copy path must never round-trip through text. ABSTRACT
    * on purpose (r6 ADVICE): a UTF-8 String default here would silently
    * corrupt any binary payload a `spark.graft.logStore.factory` plugin
    * copies (parquet is not valid UTF-8) — a store that cannot move bytes
    * must fail to compile, not corrupt checkpoints. */
  def readBytes(path: Path): Array[Byte]
  def writeBytes(path: Path, bytes: Array[Byte]): Unit

  /** Byte-exact copy `src` → `dst` (overwrite) with ATOMIC destination
    * visibility: `dst` must appear complete-or-absent, never partial — a
    * copy+delete rename publishes commit files through this, and a
    * concurrent reader observing a torn commit would replay (and
    * .crc-stamp) a snapshot missing that version's actions (r12 storm
    * find). Object-store PUTs are atomic by the store's own contract;
    * filesystem implementations must stage + rename (see
    * [[HadoopLogStore.copy]]). The default round-trips through one heap
    * array — single-PUT atomic on object-store-backed impls but O(file)
    * memory; stores with a native stream (or server-side copy) MUST
    * override so multi-GB checkpoint parts move in constant memory
    * through the [[LockingRename]] seam (r12 review find). */
  def copy(src: Path, dst: Path): Unit = writeBytes(dst, readBytes(src))

  /** Move `src` to `dst` atomically, failing with
    * [[VersionAlreadyExists]]-able `FileAlreadyExistsException` when `dst`
    * exists. Mirrors `rename_obj_noreplace`
    * (`rust/src/storage/file/rename.rs:48-65`, RENAME_NOREPLACE). */
  def renameNoReplace(src: Path, dst: Path): Unit

  def delete(path: Path): Unit

  def mkdirs(dir: Path): Unit
}

/** Hadoop-FS LogStore. On `file:` URIs the create-new rename uses
  * `Files.createLink` (atomic hard-link, kernel-enforced EEXIST — the POSIX
  * equivalent of the reference's `renameat2(RENAME_NOREPLACE)`), because both
  * `File.renameTo` and nio `ATOMIC_MOVE` silently replace an existing
  * destination on Linux. Object stores without a native create-new primitive
  * need an external lock (the reference's DynamoDB lock client,
  * `rust/src/storage/s3/dynamodb_lock.rs`) and are out of local scope.
  */
final class HadoopLogStore(conf: Configuration) extends LogStore {

  private def fs(path: Path): FileSystem = path.getFileSystem(conf)

  override def list(dir: Path): Seq[FileStatus] =
    try fs(dir).listStatus(dir).toSeq.sortBy(_.getPath.getName)
    catch { case _: FileNotFoundException => Nil }

  override def exists(path: Path): Boolean = fs(path).exists(path)

  override def fileStatus(path: Path): FileStatus = fs(path).getFileStatus(path)

  override def read(path: Path): String = {
    val in = fs(path).open(path)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  override def write(path: Path, content: String): Unit = {
    val out = fs(path).create(path, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def isLocal(path: Path): Boolean = {
    val scheme = Option(path.toUri.getScheme).getOrElse("file")
    scheme == "file"
  }

  private def localPath(path: Path): java.nio.file.Path = {
    val uri = path.toUri
    if (uri.getScheme == null) Paths.get(uri.getPath)
    else Paths.get(new URI("file", null, uri.getPath, null))
  }

  override def renameNoReplace(src: Path, dst: Path): Unit =
    if (isLocal(src) && isLocal(dst)) {
      val (s, d) = (localPath(src), localPath(dst))
      try {
        Files.createLink(d, s) // atomic; EEXIST if d exists
        Files.delete(s)
      } catch {
        case e: NioExists =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"destination exists: $dst (${e.getMessage})")
      }
    } else {
      // Generic FS: HDFS rename has no-replace semantics for files; object
      // stores must provide their own lock-backed implementation (enforced
      // by DeltaLog.forPath's scheme fence).
      val f = fs(dst)
      if (f.exists(dst))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(s"destination exists: $dst")
      if (!f.rename(src, dst)) {
        // exists→rename is not atomic: a racer can land dst between the two
        // calls, and HDFS signals that as `false`, not an exception — map it
        // to the conflict type the commit loop retries on
        if (f.exists(dst))
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"destination exists (lost rename race): $dst")
        throw new IOException(s"rename $src -> $dst failed")
      }
    }

  override def readBytes(path: Path): Array[Byte] = {
    val in = fs(path).open(path)
    try in.readAllBytes()
    finally in.close()
  }

  override def writeBytes(path: Path, bytes: Array[Byte]): Unit = {
    val out = fs(path).create(path, true)
    try out.write(bytes)
    finally out.close()
  }

  /** Streaming copy — constant memory regardless of file size — with
    * ATOMIC destination visibility: bytes stream into a hidden sibling
    * tmp and a filesystem rename publishes the complete file. A real
    * object store's PUT is all-or-nothing; streaming straight into `dst`
    * on a filesystem is NOT — a concurrent reader of a commit file being
    * copy+delete-renamed under the lock could replay a PARTIAL commit,
    * building (and .crc-stamping) a snapshot missing that version's adds
    * (r12: caught by the lock-contended storm, a wrong-checksum flake). */
  override def copy(src: Path, dst: Path): Unit = {
    val tmp = new Path(dst.getParent,
      s".${dst.getName}.${java.util.UUID.randomUUID()}.copytmp")
    val in = fs(src).open(src)
    try {
      val out = fs(tmp).create(tmp, true)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024)
      finally out.close()
    } finally in.close()
    val f = fs(dst)
    try {
      if (f.exists(dst)) f.delete(dst, false) // copy overwrites, like PUT
      if (!f.rename(tmp, dst))
        throw new IOException(s"copy publish $tmp -> $dst failed")
    } finally {
      if (f.exists(tmp)) f.delete(tmp, false)
    }
  }

  override def delete(path: Path): Unit = fs(path).delete(path, false)

  override def mkdirs(dir: Path): Unit = fs(dir).mkdirs(dir)
}

/** Seam for [[DeltaLog.forPath]]'s store selection, named by the session
  * conf `spark.graft.logStore.factory` (a zero-arg-constructible class):
  * the hook through which an object-store deployment swaps in a
  * lock-backed store ([[ObjectStoreLogStore]]) without touching callers —
  * the role of the reference's `parse_uri` scheme dispatch
  * (`rust/src/storage/mod.rs:141-192`). */
trait LogStoreFactory {
  def create(spark: org.apache.spark.sql.SparkSession, tablePath: Path): LogStore
}

/** LogStore for object stores WITHOUT an atomic create-new rename (the
  * S3-class case): every operation delegates to `inner` except
  * [[renameNoReplace]], which runs the non-atomic copy+delete under the
  * distributed lease with crash repair ([[LockingRename]]) — the
  * composition the reference ships as S3StorageBackend + DynamoDB lock
  * (`rust/src/storage/s3/mod.rs:373-398,495-549`). Commit linearization:
  * the copy's destination-exists check under the lease surfaces
  * FileAlreadyExistsException, which [[OptimisticTransaction]] already
  * treats as a version conflict and retries. */
final class ObjectStoreLogStore(inner: LogStore, client: LockClient)
    extends LogStore {

  private val ops = new LockingRename.StoreRenameOps(inner)

  override def renameNoReplace(src: Path, dst: Path): Unit =
    LockingRename.rename(ops, client, src, dst)

  override def list(dir: Path): Seq[FileStatus] = inner.list(dir)
  override def exists(path: Path): Boolean = inner.exists(path)
  override def existsObject(path: Path): Boolean = inner.existsObject(path)
  override def fileStatus(path: Path): FileStatus = inner.fileStatus(path)
  override def read(path: Path): String = inner.read(path)
  override def write(path: Path, content: String): Unit = inner.write(path, content)
  override def readBytes(path: Path): Array[Byte] = inner.readBytes(path)
  override def writeBytes(path: Path, bytes: Array[Byte]): Unit =
    inner.writeBytes(path, bytes)
  override def copy(src: Path, dst: Path): Unit = inner.copy(src, dst)
  override def delete(path: Path): Unit = inner.delete(path)
  override def mkdirs(dir: Path): Unit = inner.mkdirs(dir)
}
