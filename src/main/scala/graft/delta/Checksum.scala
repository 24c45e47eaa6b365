package graft.delta

import com.fasterxml.jackson.databind.JsonNode
import org.apache.hadoop.fs.Path

/** Per-version checksum files — `_delta_log/%020d.crc`, the delta-spark
  * convention (one JSON line summarizing the post-commit snapshot:
  * tableSizeBytes, numFiles, metadata, protocol, setTransactions, domain
  * metadata). Beyond the reference, which has no checksum story.
  *
  * Two jobs:
  *  1. WRITE one after every graft commit, so foreign readers that
  *     validate state against `.crc` (delta-spark does) can verify a
  *     graft-written log.
  *  2. VALIDATE our replay against whatever `.crc` exists — including
  *     files a FOREIGN writer recorded. A replay bug (lost add, double
  *     tombstone, wrong size fold) surfaces as a loud mismatch against
  *     the writer's own bookkeeping instead of silently serving wrong
  *     rows.
  *
  * Checksums are advisory: absence is never an error, and writes are
  * best-effort (a failed `.crc` write must not fail the commit that
  * already landed — the log is the source of truth).
  */
object Checksum {

  def fileFor(log: DeltaLog, version: Long): Path =
    new Path(log.logPath, DeltaLog.pad20(version) + ".crc")

  /** The fields graft validates (a subset of delta-spark's record; the
    * rest rides along on write and is ignored on read). */
  final case class Crc(tableSizeBytes: Long, numFiles: Long,
                       domainMetadata: Option[Map[String, String]])

  /** Write the checksum for `snap` (best-effort; see scaladoc). */
  def write(log: DeltaLog, snap: Snapshot): Unit =
    try {
      val o = ActionCodec.mapper.createObjectNode()
      o.put("tableSizeBytes", snap.files.map(_.size).sum)
      o.put("numFiles", snap.files.size.toLong)
      o.put("numMetadata", 1L)
      o.put("numProtocol", 1L)
      // gate on the config: for non-ICT tables the lookup would re-read
      // the just-written commit file on EVERY commit only to find nothing
      if (TableConfig.inCommitTimestampsEnabled(TableConfig.of(snap)))
        log.inCommitTimestampOf(snap.version)
          .foreach(o.put("inCommitTimestampOpt", _))
      // metadata + protocol as their action bodies (delta-spark's shape)
      snap.metadata.foreach { md =>
        o.set[JsonNode]("metadata",
          ActionCodec.toNode(md).get("metaData"))
      }
      o.set[JsonNode]("protocol", ActionCodec.toNode(ProtocolAction(
        snap.minReaderVersion, snap.minWriterVersion,
        snap.readerFeatures, snap.writerFeatures)).get("protocol"))
      if (snap.appTransactionVersion.nonEmpty) {
        val arr = o.putArray("setTransactions")
        snap.appTransactionVersion.toSeq.sortBy(_._1).foreach { case (app, v) =>
          val t = arr.addObject()
          t.put("appId", app)
          t.put("version", v)
        }
      }
      if (snap.domainMetadata.nonEmpty) {
        val arr = o.putArray("domainMetadata")
        snap.domainMetadata.toSeq.sortBy(_._1).foreach { case (d, c) =>
          val n = arr.addObject()
          n.put("domain", d)
          n.put("configuration", c)
          n.put("removed", false)
        }
      }
      log.store.write(fileFor(log, snap.version),
        ActionCodec.mapper.writeValueAsString(o))
    } catch { case _: Exception => () } // advisory, never fail the commit

  /** Tolerant read; None when absent or unparsable. */
  def read(log: DeltaLog, version: Long): Option[Crc] =
    try {
      val p = fileFor(log, version)
      if (!log.store.exists(p)) None
      else {
        val n = ActionCodec.mapper.readTree(log.store.read(p))
        for {
          size <- Option(n.get("tableSizeBytes")).filterNot(_.isNull).map(_.asLong)
          files <- Option(n.get("numFiles")).filterNot(_.isNull).map(_.asLong)
        } yield Crc(size, files,
          Option(n.get("domainMetadata")).filterNot(_.isNull).map { arr =>
            import scala.jdk.CollectionConverters._
            arr.elements().asScala.filterNot(d =>
              Option(d.get("removed")).exists(_.asBoolean(false)))
              .map(d => d.get("domain").asText ->
                Option(d.get("configuration")).filterNot(_.isNull)
                  .map(_.asText).getOrElse("")).toMap
          })
      }
    } catch { case _: Exception => None }

  /** Compare a freshly-replayed snapshot against the version's recorded
    * checksum, if one exists. A mismatch means the replay and the
    * WRITER'S own bookkeeping disagree — serving rows from that snapshot
    * would be guessing, so fail loudly. */
  def validate(log: DeltaLog, snap: Snapshot): Unit =
    read(log, snap.version).foreach { crc =>
      val size = snap.files.map(_.size).sum
      val n = snap.files.size.toLong
      if (crc.numFiles != n || crc.tableSizeBytes != size)
        throw new IllegalStateException(
          s"checksum mismatch at ${log.tablePath} version ${snap.version}: " +
          s".crc records numFiles=${crc.numFiles} tableSizeBytes=" +
          s"${crc.tableSizeBytes}, replay produced numFiles=$n " +
          s"tableSizeBytes=$size — the log replay and the writer's own " +
          "bookkeeping disagree")
      crc.domainMetadata.foreach { doms =>
        if (doms != snap.domainMetadata)
          throw new IllegalStateException(
            s"checksum mismatch at ${log.tablePath} version ${snap.version}: " +
            s".crc records domain metadata $doms, replay produced " +
            s"${snap.domainMetadata}")
      }
    }
}
