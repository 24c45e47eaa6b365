package graft.delta

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** A local filesystem registered under scheme `graftauth` whose URIs carry
  * an AUTHORITY (`graftauth://bucket/abs/path` stores at local `/abs/path`)
  * — the path shape of `s3a://bucket/...` and `hdfs://nn:port/...`, which
  * plain `file:` test paths never exercise. The r7 advisor found the change
  * feed's file→version join silently matched nothing on such paths because
  * the two join sides normalized the authority differently; specs route
  * tables through this FS to keep that class of bug caught. */
class AuthorityFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create(AuthorityFs.Root)

  /** RawLocal's lazy permission probe does `new File(status.getPath.toUri)`,
    * which rejects non-`file:` schemes — copy statuses eagerly with a fixed
    * permission so the probe never runs on `graftauth://` paths. */
  private def eager(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      FsPermission.getDefault, null, null, st.getPath)

  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(eager)
}

object AuthorityFs {
  val Scheme = "graftauth"
  val Root = s"$Scheme://bucket"

  /** Register on the shared session's Hadoop conf (idempotent) and wrap a
    * local absolute path as an authority-bearing URI. */
  def wrap(spark: org.apache.spark.sql.SparkSession, localAbsPath: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set(s"fs.$Scheme.impl", classOf[AuthorityFs].getName)
    s"$Root$localAbsPath"
  }
}
