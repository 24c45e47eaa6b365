package graft.delta

import com.fasterxml.jackson.databind.JsonNode
import scala.collection.mutable

/** Immutable table state at one version.
  *
  * Mirrors `DeltaTableState` (`rust/src/delta.rs:325-335`): active files,
  * tombstones, protocol minimums, current metadata, per-app txn versions,
  * commitInfos.
  *
  * Scale note: the file list is O(#files) on the driver, like the reference's
  * `Vec<Add>`. At 100 TB (~1M files of 100 MB) this is ~hundreds of MB of
  * driver heap — acceptable with a large driver; the log-replay fold below is
  * O(n) (hash-map keyed by path), never O(n²).
  */
final case class Snapshot(
    version: Long = -1L,
    files: Vector[AddAction] = Vector.empty,
    tombstones: Vector[RemoveAction] = Vector.empty,
    metadata: Option[MetaDataAction] = None,
    minReaderVersion: Int = 0,
    minWriterVersion: Int = 0,
    appTransactionVersion: Map[String, Long] = Map.empty,
    commitInfos: Vector[JsonNode] = Vector.empty) {

  def schema: org.apache.spark.sql.types.StructType =
    metadata.map(m => DeltaSchema.fromJson(m.schemaString))
      .getOrElse(throw new IllegalStateException("no metaData action in log"))

  def partitionColumns: Seq[String] = metadata.map(_.partitionColumns).getOrElse(Nil)

  /** Aggregate per-file stats into table-level statistics — the reference's
    * `statistics()` fold (`rust/src/delta_datafusion.rs:117-209`). */
  lazy val statistics: TableStatistics = {
    val parsed = files.flatMap(_.stats.flatMap(ActionCodec.statsFromJson))
    val numRecords = if (parsed.size == files.size) Some(parsed.map(_.numRecords).sum) else None
    TableStatistics(
      numFiles = files.size,
      sizeInBytes = files.map(_.size).sum,
      numRecords = numRecords)
  }
}

final case class TableStatistics(numFiles: Long, sizeInBytes: Long, numRecords: Option[Long])

object Snapshot {

  /** Fold actions into state — the one true log-replay kernel, mirroring
    * `process_action` (`rust/src/delta.rs:1418-1449`): add→append file;
    * remove→drop matching path, retain tombstone; protocol→min versions;
    * metaData→full replace; txn→last-wins upsert; commitInfo→append.
    *
    * Unlike the reference's linear `Vec::retain` per remove (O(n²) worst
    * case), the fold keys active files by path in an insertion-ordered map.
    * A re-add of an existing path replaces it in place (Delta protocol
    * semantics; the reference's writer never emits duplicate adds).
    */
  def replay(base: Snapshot, actions: Iterator[Action], newVersion: Long): Snapshot = {
    val files = new mutable.LinkedHashMap[String, AddAction]
    base.files.foreach(a => files.put(a.path, a))
    val tombstones = mutable.ArrayBuffer[RemoveAction](base.tombstones: _*)
    var metadata = base.metadata
    var minReader = base.minReaderVersion
    var minWriter = base.minWriterVersion
    val txns = mutable.Map[String, Long](base.appTransactionVersion.toSeq: _*)
    val commitInfos = mutable.ArrayBuffer[JsonNode](base.commitInfos: _*)

    actions.foreach {
      case a: AddAction => files.put(a.path, a)
      case r: RemoveAction =>
        files.remove(r.path)
        tombstones += r
      case p: ProtocolAction =>
        minReader = p.minReaderVersion
        minWriter = p.minWriterVersion
      case m: MetaDataAction => metadata = Some(m)
      case t: TxnAction => txns.put(t.appId, t.version)
      case ci: CommitInfoAction => commitInfos += ci.info
    }

    Snapshot(
      version = newVersion,
      files = files.values.toVector,
      tombstones = tombstones.toVector,
      metadata = metadata,
      minReaderVersion = minReader,
      minWriterVersion = minWriter,
      appTransactionVersion = txns.toMap,
      commitInfos = commitInfos.toVector)
  }
}
