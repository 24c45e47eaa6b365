package graft.delta

import com.fasterxml.jackson.databind.JsonNode
import scala.collection.mutable

/** Immutable table state at one version.
  *
  * Mirrors `DeltaTableState` (`rust/src/delta.rs:325-335`): active files,
  * tombstones, protocol minimums, current metadata, per-app txn versions,
  * and the LATEST commitInfo only. The reference accumulates every
  * historical commitInfo in table state; at 100k commits that is dead
  * driver weight on every load, so history is served from the commit files
  * on demand ([[DeltaTable.history]] / `graft_history`) instead of carried
  * here.
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
    readerFeatures: Option[Set[String]] = None,
    writerFeatures: Option[Set[String]] = None,
    appTransactionVersion: Map[String, Long] = Map.empty,
    lastCommitInfo: Option[JsonNode] = None,
    domainMetadata: Map[String, String] = Map.empty) {

  def schema: org.apache.spark.sql.types.StructType =
    metadata.map(m => DeltaSchema.fromJson(m.schemaString))
      .getOrElse(throw new IllegalStateException("no metaData action in log"))

  def partitionColumns: Seq[String] = metadata.map(_.partitionColumns).getOrElse(Nil)

  /** Aggregate per-file stats into table-level statistics — the reference's
    * `statistics()` fold (`rust/src/delta_datafusion.rs:117-209`). */
  lazy val statistics: TableStatistics = TableStatistics.of(files)
}

final case class TableStatistics(
    numFiles: Long,
    sizeInBytes: Long,
    numRecords: Option[Long],
    minValues: Map[String, JsonNode] = Map.empty,
    maxValues: Map[String, JsonNode] = Map.empty,
    nullCounts: Map[String, Long] = Map.empty)

object TableStatistics {

  /** Merge per-file stats over any file set: row count, byte size, and
    * per-column min/max/nullCount. Column values stay raw JSON nodes
    * (numbers/strings — the same skip-on-doubt discipline as
    * [[StatsPredicate]]); a column's min/max is None when any file lacks it
    * or types are incomparable. */
  def of(files: Seq[AddAction]): TableStatistics = {
    val parsed = files.flatMap(_.stats.flatMap(ActionCodec.statsFromJson))
    var complete = parsed.size == files.size
    // logical rows subtract deletion-vector cardinalities; per-column
    // min/max/nullCount of a DV'd file describe its PHYSICAL rows — still
    // valid BOUNDS for pruning, but no longer exact answers, so they are
    // dropped here (the stats-only aggregate rewrite must bail on them)
    val dvCards = files.map(DeletionVectors.cardinality).sum
    val numRecords = if (complete) Some(parsed.map(_.numRecords).sum - dvCards) else None
    if (dvCards > 0) complete = false

    // exact numeric comparison via decimalValue: asDouble collapses int64
    // values past 2^53 (…992 vs …993 compare equal) and the stats-only
    // aggregate rewrite would then serve a WRONG exact MIN/MAX (r9 review)
    def isLess(a: JsonNode, b: JsonNode): Option[Boolean] =
      if (a.isNumber && b.isNumber)
        Some(a.decimalValue.compareTo(b.decimalValue) < 0)
      else if (a.isTextual && b.isTextual) Some(a.asText < b.asText)
      else None
    def fold(maps: Seq[Map[String, JsonNode]], keepLeft: (JsonNode, JsonNode) => Option[Boolean])
        : Map[String, JsonNode] =
      if (!complete || maps.isEmpty) Map.empty
      else {
        val keys = maps.map(_.keySet).reduce(_ intersect _)
        keys.flatMap { k =>
          val vs = maps.map(_(k))
          // incomparable types abandon THIS column only, not the whole
          // fold (the non-local return here used to nuke every column)
          vs.tail.foldLeft(Option(vs.head)) { (bestOpt, v) =>
            bestOpt.flatMap(best => keepLeft(best, v) match {
              case Some(true) => Some(best)
              case Some(false) => Some(v)
              case None => None
            })
          }.map(k -> _)
        }.toMap
      }

    val mins = fold(parsed.map(_.minValues), (a, b) => isLess(a, b))
    val maxs = fold(parsed.map(_.maxValues), (a, b) => isLess(b, a))
    val nulls: Map[String, Long] =
      if (!complete || parsed.isEmpty) Map.empty
      else {
        val keys = parsed.map(_.nullCount.keySet).reduce(_ intersect _)
        keys.flatMap { k =>
          val vs = parsed.map(_.nullCount(k))
          if (vs.forall(_.isNumber)) Some(k -> vs.map(_.asLong).sum) else None
        }.toMap
      }

    TableStatistics(
      numFiles = files.size,
      sizeInBytes = files.map(_.size).sum,
      numRecords = numRecords,
      minValues = mins,
      maxValues = maxs,
      nullCounts = nulls)
  }
}

object Snapshot {

  /** Fold actions into state — the one true log-replay kernel, mirroring
    * `process_action` (`rust/src/delta.rs:1418-1449`): add→append file;
    * remove→drop matching path, retain tombstone; protocol→min versions;
    * metaData→full replace; txn→last-wins upsert; commitInfo→last-wins
    * (state keeps only the newest operation's provenance).
    *
    * Unlike the reference's linear `Vec::retain` per remove (O(n²) worst
    * case), the fold keys active files by path in an insertion-ordered map.
    * A re-add of an existing path replaces it in place (Delta protocol
    * semantics; the reference's writer never emits duplicate adds).
    */
  def replay(base: Snapshot, actions: Iterator[Action], newVersion: Long): Snapshot = {
    val st = new ReplayState(base)
    st.fold(actions)
    st.result(newVersion)
  }

  /** The replay fold's mutable state, reusable across a whole commit TAIL:
    * materializing the base maps costs O(#files), so a per-commit
    * `replay()` call inside a tail loop is O(tail × files) — the 10⁷-Add
    * decade probe (r12 verdict #5) spent MINUTES there. A long tail folds
    * through ONE ReplayState instead: O(files + tail-actions) total
    * ([[DeltaLog.replayTail]]). Same fold kernel, same semantics — this IS
    * the body `replay()` runs. */
  final class ReplayState(base: Snapshot) {
    private val files = new mutable.LinkedHashMap[String, AddAction]
    base.files.foreach(a => files.put(a.path, a))
    // tombstones keyed by path, LAST remove wins: a path re-deleted every
    // DML cycle (DV re-adds do this on purpose) must not grow the tombstone
    // list — and therefore every future checkpoint — by one entry per
    // cycle. Expiry then judges by the LATEST deletionTimestamp, which is
    // also the correct vacuum semantics.
    private val tombstones = new mutable.LinkedHashMap[String, RemoveAction]
    base.tombstones.foreach(r => tombstones.put(r.path, r))
    private var metadata = base.metadata
    private var minReader = base.minReaderVersion
    private var minWriter = base.minWriterVersion
    private var readerFeats = base.readerFeatures
    private var writerFeats = base.writerFeatures
    private val txns = mutable.Map[String, Long](base.appTransactionVersion.toSeq: _*)
    private var lastCommitInfo = base.lastCommitInfo
    private val domains = mutable.Map[String, String](base.domainMetadata.toSeq: _*)

    def fold(actions: Iterator[Action]): Unit = actions.foreach {
      case a: AddAction => files.put(a.path, a)
      case r: RemoveAction =>
        files.remove(r.path)
        tombstones.put(r.path, r)
      case p: ProtocolAction =>
        minReader = p.minReaderVersion
        minWriter = p.minWriterVersion
        readerFeats = p.readerFeatures
        writerFeats = p.writerFeatures
      case m: MetaDataAction => metadata = Some(m)
      case t: TxnAction => txns.put(t.appId, t.version)
      case ci: CommitInfoAction => lastCommitInfo = Some(ci.info)
      case _: CdcAction => () // change-data files are commit-scoped, not state
      // latest action per domain wins; removed=true deletes the domain
      // (delta-spark keeps only live domains in snapshot state — a removal
      // needs no checkpoint tombstone because checkpoints are state dumps)
      case d: DomainMetadataAction =>
        if (d.removed) domains.remove(d.domain)
        else domains.put(d.domain, d.configuration)
      // v2-checkpoint structural actions: never table state (the sidecar
      // EXPANSION happens at read time, before replay sees the actions)
      case _: CheckpointMetadataAction | _: SidecarAction => ()
    }

    /** Read-only view of the CURRENT active files — for consumers that
      * need only the file map mid-fold (the change feed's remove-only
      * branch), without paying [[result]]'s full Snapshot materialization
      * (tombstones/txns/domains copied to immutable collections) per read. */
    def activeFiles: Iterator[AddAction] = files.valuesIterator

    def result(newVersion: Long): Snapshot = Snapshot(
      version = newVersion,
      files = files.values.toVector,
      tombstones = tombstones.values.toVector,
      metadata = metadata,
      minReaderVersion = minReader,
      minWriterVersion = minWriter,
      readerFeatures = readerFeats,
      writerFeatures = writerFeats,
      appTransactionVersion = txns.toMap,
      lastCommitInfo = lastCommitInfo,
      domainMetadata = domains.toMap)
  }
}
