package graft.delta

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UriPathDecode

/** The Delta protocol stores file paths in actions "encoded as a URI"
  * (PROTOCOL.md; delta-spark writes `region=North America/f.parquet` on disk
  * as `add.path = "region=North%20America/f.parquet"`, and a Hive-escaped
  * `%` in a directory name as `%25`). The reference joins action paths raw
  * (rust/src/delta.rs:733 `new Path(table, add.path)` equivalent), which
  * breaks on any delta-spark-written table whose paths carry an encodable
  * character — graft instead keeps the SINGLE invariant:
  *
  *   in-memory `AddAction.path` / `RemoveAction.path` / `CdcAction.path`
  *   is ALWAYS the decoded, on-disk-relative path.
  *
  * Encode/decode happens only at the serialization boundaries — the JSON
  * action codec ([[ActionCodec]]), the parquet checkpoint codec
  * ([[Checkpoints]]), and the Spark-native log scan
  * ([[DistributedReplay]], via [[graft.functions.UriPathDecodeExpr]]) — so
  * every in-memory comparison (replay, conflicts, vacuum live-set, DV
  * bookkeeping, rewrite fences) lives in one path space and `new
  * Path(tablePath, a.path)` resolves to the real file.
  *
  * Encoding matches `java.net.URI`'s path quoting (what Hadoop `Path.toUri`
  * and delta-spark produce): unreserved + sub-delims + `:@/` stay literal,
  * everything else — space, `%`, `#`, `?`, brackets, non-ASCII UTF-8
  * bytes — becomes `%XX`. `%` is always encoded, so
  * `decode(encode(p)) == p` for every path, including Hive-escaped
  * directory names with literal `%` (partition value `a=b` → dir
  * `col=a%3Db` → action `col=a%253Db`). Absolute action paths (shallow
  * CLONE) keep their scheme/authority because `:` and `/` pass through.
  */
object ActionPath {

  /** Protocol (encoded) → in-memory (decoded, on-disk) path space. */
  def decode(p: String): String =
    if (p == null || p.indexOf('%') < 0) p
    else UriPathDecode.decode(UTF8String.fromString(p)).toString

  private val keep: Array[Boolean] = {
    val k = new Array[Boolean](128)
    def set(cs: Iterable[Char]): Unit = cs.foreach(c => k(c) = true)
    set('A' to 'Z'); set('a' to 'z'); set('0' to '9')
    set("-._~")                  // unreserved
    set("!$&'()*+,;=")           // sub-delims
    set(":@/")                   // pchar extras + segment separator
    k
  }
  private val hex = "0123456789ABCDEF"

  /** In-memory (decoded) → protocol (encoded) path space. */
  def encode(p: String): String = {
    if (p == null) return null
    val bytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var clean = true
    var i = 0
    while (i < bytes.length && clean) {
      val b = bytes(i) & 0xff
      if (b >= 128 || !keep(b)) clean = false
      i += 1
    }
    if (clean) return p
    val sb = new java.lang.StringBuilder(bytes.length + 8)
    i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 128 && keep(b)) sb.append(b.toChar)
      else {
        sb.append('%').append(hex(b >> 4)).append(hex(b & 0xf))
      }
      i += 1
    }
    sb.toString
  }
}
