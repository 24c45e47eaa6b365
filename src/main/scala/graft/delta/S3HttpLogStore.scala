package graft.delta

import java.io.FileNotFoundException
import java.net.http.HttpResponse
import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, Path}

/** Wire-level S3 [[LogStore]]: the S3 REST API (path-style) over JDK
  * `java.net.http`, with real AWS Signature V4 request signing — no SDK,
  * no hadoop-aws, zero added dependencies. The reference ships this store
  * natively (`rust/src/storage/s3/mod.rs` — head/get/put/list/delete plus
  * the lock-client rename at :190-222); graft keeps the SAME architecture:
  * this class is the dumb byte store, and commit atomicity comes from
  * wrapping it in [[ObjectStoreLogStore]] (lease-serialized copy+delete
  * rename), exactly like the reference's `S3StorageBackend { inner,
  * lock_client }`.
  *
  * Semantics relied on (and conformance-proven against a live endpoint by
  * S3HttpLogStoreConformanceSpec, which runs the full [[LogStore]]
  * contract matrix against a local moto S3 server):
  *  - PUT/GET/DELETE are read-after-write consistent (true of S3 since
  *    2020-12, and of moto);
  *  - ListObjectsV2 with `delimiter=/` yields direct children only, in
  *    UTF-8-binary (= name-sorted) order, immediately after PUT;
  *  - CopyObject publishes complete-or-absent — a reader never observes a
  *    torn prefix;
  *  - DELETE of a missing key succeeds (idempotent takedown).
  *
  * `renameNoReplace` on the RAW store refuses by default: S3 has no
  * create-new primitive, so a bare exists+copy+delete is the exact
  * two-writers-both-pass race [[DeltaLog.NonAtomicRenameSchemes]] fences.
  * Production wraps with [[ObjectStoreLogStore]] (see
  * [[S3HttpLogStoreFactory]]); `allowUnsafeRename = true` opts a
  * SINGLE-writer deployment out, mirroring the engine-level fence.
  *
  * Scope: this store carries the `_delta_log` I/O (commits, checkpoints,
  * `_last_checkpoint`, CDC sidecars routed through the LogStore seam).
  * Table DATA files go through Spark's Hadoop FileSystem layer, which
  * needs the hadoop-aws connector jar — absent from this environment, so
  * data-file I/O against S3 stays environment-bound.
  */
final class S3HttpLogStore(endpoint: String, region: String,
                           accessKey: String, secretKey: String,
                           allowUnsafeRename: Boolean = false) extends LogStore {

  private val aws = new AwsSigV4Http(endpoint, region, "s3",
    accessKey, secretKey)

  /** (bucket, key) from `s3://bucket/key...`. */
  private def split(path: Path): (String, String) = {
    val u = path.toUri
    val bucket = u.getAuthority
    require(bucket != null && bucket.nonEmpty, s"no bucket in $path")
    (bucket, u.getPath.stripPrefix("/"))
  }

  /** Sign + send through the shared SigV4 client (path-style). */
  private def request(method: String, bucket: String, key: String,
                      query: Seq[(String, String)] = Nil,
                      payload: Array[Byte] = Array.emptyByteArray,
                      extraHeaders: Seq[(String, String)] = Nil)
      : HttpResponse[Array[Byte]] = {
    val canonicalUri = "/" + aws.enc(bucket, keepSlash = false) +
      (if (key.isEmpty) "" else "/" + aws.enc(key, keepSlash = true))
    aws.send(method, canonicalUri, query, payload, extraHeaders)
  }

  private def enc(s: String, keepSlash: Boolean): String =
    aws.enc(s, keepSlash)

  private def fail(what: String, r: HttpResponse[Array[Byte]]): Nothing =
    throw new java.io.IOException(
      s"S3 $what failed: HTTP ${r.statusCode()} " +
      new String(r.body(), StandardCharsets.UTF_8).take(300))

  // ---- LogStore -------------------------------------------------------

  override def exists(path: Path): Boolean = {
    val (b, k) = split(path)
    val r = request("HEAD", b, k)
    if (r.statusCode() == 200) true
    else if (r.statusCode() == 404) {
      // a "directory" exists iff any key lives under its prefix
      val l = request("GET", b, "", Seq("list-type" -> "2",
        "prefix" -> (k.stripSuffix("/") + "/"), "max-keys" -> "1"))
      // a failed probe must RAISE, not read as "absent" — callers branch
      // on existence (lease repair, log discovery) and a silent false
      // sends them down the wrong arm
      if (l.statusCode() != 200) fail("ListObjectsV2", l)
      new String(l.body(), StandardCharsets.UTF_8).contains("<Key>")
    } else fail("HEAD", r)
  }

  override def existsObject(path: Path): Boolean = {
    val (b, k) = split(path)
    val r = request("HEAD", b, k)
    if (r.statusCode() == 200) true
    else if (r.statusCode() == 404) false // object semantics: no prefix probe
    else fail("HEAD", r)
  }

  override def fileStatus(path: Path): FileStatus = {
    val (b, k) = split(path)
    val r = request("HEAD", b, k)
    if (r.statusCode() == 404) throw new FileNotFoundException(path.toString)
    if (r.statusCode() != 200) fail("HEAD", r)
    val len = r.headers().firstValueAsLong("Content-Length").orElse(0L)
    val lm = r.headers().firstValue("Last-Modified")
    val mtime =
      if (lm.isPresent)
        try java.time.ZonedDateTime.parse(lm.get,
          DateTimeFormatter.RFC_1123_DATE_TIME).toInstant.toEpochMilli
        catch { case _: Exception => 0L }
      else 0L
    new FileStatus(len, false, 1, 128L * 1024 * 1024, mtime, path)
  }

  override def readBytes(path: Path): Array[Byte] = {
    val (b, k) = split(path)
    val r = request("GET", b, k)
    if (r.statusCode() == 404) throw new FileNotFoundException(path.toString)
    if (r.statusCode() != 200) fail("GET", r)
    r.body()
  }

  override def read(path: Path): String =
    new String(readBytes(path), StandardCharsets.UTF_8)

  override def writeBytes(path: Path, bytes: Array[Byte]): Unit = {
    val (b, k) = split(path)
    val r = request("PUT", b, k, payload = bytes)
    if (r.statusCode() / 100 != 2) fail("PUT", r)
  }

  override def write(path: Path, content: String): Unit =
    writeBytes(path, content.getBytes(StandardCharsets.UTF_8))

  override def copy(src: Path, dst: Path): Unit = {
    val (sb, sk) = split(src)
    val (db, dk) = split(dst)
    val r = request("PUT", db, dk, extraHeaders = Seq(
      "x-amz-copy-source" -> ("/" + enc(sb, keepSlash = false) + "/" +
        enc(sk, keepSlash = true))))
    if (r.statusCode() / 100 != 2) fail("CopyObject", r)
    // CopyObject can return 200 with an error document mid-copy — the
    // documented S3 trap; a real error carries <Error> instead of
    // <CopyObjectResult>
    val body = new String(r.body(), StandardCharsets.UTF_8)
    if (body.contains("<Error>")) fail("CopyObject", r)
  }

  override def delete(path: Path): Unit = {
    val (b, k) = split(path)
    val r = request("DELETE", b, k)
    // 204 on success, and S3 DELETE of a missing key is also 204
    if (r.statusCode() / 100 != 2 && r.statusCode() != 404) fail("DELETE", r)
  }

  override def mkdirs(dir: Path): Unit = () // prefixes need no creation

  override def list(dir: Path): Seq[FileStatus] = {
    val (b, k) = split(dir)
    val prefix = if (k.isEmpty) "" else k.stripSuffix("/") + "/"
    val out = Seq.newBuilder[FileStatus]
    var token: Option[String] = None
    var done = false
    while (!done) {
      val q = Seq("list-type" -> "2", "prefix" -> prefix, "delimiter" -> "/") ++
        token.map("continuation-token" -> _)
      val r = request("GET", b, "", q)
      if (r.statusCode() != 200) fail("ListObjectsV2", r)
      val xml = scala.xml.XML.loadString(
        new String(r.body(), StandardCharsets.UTF_8))
      (xml \ "Contents").foreach { c =>
        val key = (c \ "Key").text
        if (key != prefix) { // a zero-byte dir marker is not a child file
          val len = (c \ "Size").text.toLong
          val mtime = try java.time.Instant.parse((c \ "LastModified").text)
            .toEpochMilli catch { case _: Exception => 0L }
          out += new FileStatus(len, false, 1, 128L * 1024 * 1024, mtime,
            new Path(s"s3://$b/$key"))
        }
      }
      (xml \ "CommonPrefixes").foreach { cp =>
        val p = (cp \ "Prefix").text.stripSuffix("/")
        out += new FileStatus(0, true, 1, 0, 0,
          new Path(s"s3://$b/$p"))
      }
      token = (xml \ "NextContinuationToken").headOption.map(_.text)
      done = token.isEmpty
    }
    // S3 returns Contents and CommonPrefixes each sorted; the merged child
    // list must be name-sorted too (the LogStore contract `update()` leans
    // on for commit discovery)
    out.result().sortBy(_.getPath.getName)
  }

  override def renameNoReplace(src: Path, dst: Path): Unit = {
    if (!allowUnsafeRename)
      throw new IllegalStateException(
        "S3 has no atomic create-new rename: two concurrent committers " +
        "would both pass the exists check and the loser silently " +
        "overwrites the winner. Wrap this store in ObjectStoreLogStore " +
        "(lease-serialized rename — see S3HttpLogStoreFactory), or pass " +
        "allowUnsafeRename = true for SINGLE-writer use only")
    if (existsObject(dst)) throw new FileAlreadyExistsException(dst.toString)
    if (!existsObject(src)) throw new FileNotFoundException(src.toString)
    copy(src, dst)
    delete(src)
  }

  /** Create a bucket (tooling/tests; production buckets pre-exist).
    * Succeeds if the bucket already exists. */
  def createBucket(bucket: String): Unit = {
    val r = request("PUT", bucket, "")
    require(r.statusCode() / 100 == 2 || r.statusCode() == 409,
      s"create bucket $bucket: HTTP ${r.statusCode()}")
  }
}

/** [[LogStoreFactory]] wiring the wire-level S3 store under the
  * lease-serialized rename wrapper — the production shape of the
  * reference's `S3StorageBackend { inner, lock_client }`. Session conf:
  *
  *  - `spark.graft.s3.endpoint`  (default `https://s3.<region>.amazonaws.com`)
  *  - `spark.graft.s3.region`    (default `us-east-1`)
  *  - `spark.graft.s3.accessKey` / `spark.graft.s3.secretKey`
  *    (fall back to `AWS_ACCESS_KEY_ID` / `AWS_SECRET_ACCESS_KEY`)
  *  - `spark.graft.s3.lockTableName` — a DynamoDB lock table: the
  *    PRODUCTION multi-process path ([[DynamoDbHttpLockBackend]], one
  *    lock item per table path, `spark.graft.dynamodb.endpoint`
  *    overridable for emulators);
  *  - `spark.graft.s3.lockBackendClass` — a zero-arg-constructible
  *    [[LockBackend]] alternative;
  *  - neither set: ONE process-wide [[InMemoryLockBackend]], which
  *    serializes committers of THIS JVM only — single-driver use.
  */
final class S3HttpLogStoreFactory extends LogStoreFactory {
  override def create(spark: org.apache.spark.sql.SparkSession,
                      tablePath: Path): LogStore = {
    def conf(k: String): Option[String] = spark.conf.getOption(k)
    val region = conf("spark.graft.s3.region").getOrElse("us-east-1")
    val endpoint = conf("spark.graft.s3.endpoint")
      .getOrElse(s"https://s3.$region.amazonaws.com")
    val ak = conf("spark.graft.s3.accessKey")
      .orElse(sys.env.get("AWS_ACCESS_KEY_ID")).getOrElse(
        throw new IllegalStateException("spark.graft.s3.accessKey unset"))
    val sk = conf("spark.graft.s3.secretKey")
      .orElse(sys.env.get("AWS_SECRET_ACCESS_KEY")).getOrElse(
        throw new IllegalStateException("spark.graft.s3.secretKey unset"))
    val backend = conf("spark.graft.s3.lockTableName") match {
      case Some(table) =>
        // the reference's production shape: a DynamoDB lock item PER
        // TABLE PATH, spoken wire-level with the same credentials
        new DynamoDbHttpLockBackend(
          conf("spark.graft.dynamodb.endpoint")
            .getOrElse(s"https://dynamodb.$region.amazonaws.com"),
          region, ak, sk, table, tablePath.toString)
      case None => conf("spark.graft.s3.lockBackendClass") match {
        case Some(cls) => Class.forName(cls).getDeclaredConstructor()
          .newInstance().asInstanceOf[LockBackend]
        case None => S3HttpLogStoreFactory.processLockBackend
      }
    }
    new ObjectStoreLogStore(
      new S3HttpLogStore(endpoint, region, ak, sk),
      new DynamoStyleLockClient(backend, LockOptions()))
  }
}

object S3HttpLogStoreFactory {
  /** The single-JVM default lease backend (see the factory doc). */
  private lazy val processLockBackend = new InMemoryLockBackend
}
