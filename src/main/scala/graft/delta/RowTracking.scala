package graft.delta

import scala.util.Try

/** Row tracking (Delta `rowTracking` writer feature) — the HONEST SUBSET
  * graft maintains:
  *
  *  - every data file carries fresh row ids `[baseRowId, baseRowId +
  *    numRecords)` born at `defaultRowCommitVersion`, allocated from the
  *    `delta.rowTracking` domain's `rowIdHighWaterMark` (delta-spark's
  *    shape) which bumps IN the allocating commit;
  *  - `defaultRowCommitVersion` is stamped at commit time per candidate
  *    version (the version is unknown until the rename lands — same
  *    discipline as the ICT clock);
  *  - appends (batch, SQL INSERT, streaming), overwrites (delete+insert
  *    semantics), merge-on-read DV DELETE (file bytes and ids unchanged),
  *    RESTORE and CLONE (actions re-committed verbatim) all preserve the
  *    contract;
  *  - operations that MOVE surviving rows to new files — copy-on-write
  *    DELETE/UPDATE, DV UPDATE's transformed copies, MERGE, OPTIMIZE and
  *    Z-ORDER — would need ids MATERIALIZED into the rewritten files to
  *    keep them stable; graft does not make that write-amplification
  *    contract, so they refuse loudly on row-tracking tables instead of
  *    silently reassigning identities.
  *
  * Concurrency: two appends racing the same high-water mark both carry a
  * `delta.rowTracking` domain bump, and same-domain concurrent writes
  * conflict ([[ConcurrentDomainMetadataException]]) — the loser aborts
  * rather than colliding id ranges.
  */
object RowTracking {

  val Feature = "rowTracking"
  val Domain = "delta.rowTracking"

  def enabled(snap: Snapshot): Boolean =
    snap.writerFeatures.exists(_.contains(Feature))

  /** Highest allocated row id (-1 before any allocation). */
  def highWaterMark(snap: Snapshot): Long =
    snap.domainMetadata.get(Domain).flatMap { cfg =>
      Try(ActionCodec.mapper.readTree(cfg).get("rowIdHighWaterMark").asLong)
        .toOption
    }.getOrElse(-1L)

  private def domainBump(newMark: Long): DomainMetadataAction = {
    val o = ActionCodec.mapper.createObjectNode()
    o.put("rowIdHighWaterMark", newMark)
    DomainMetadataAction(Domain, ActionCodec.mapper.writeValueAsString(o))
  }

  /** Assign fresh contiguous id ranges to `adds` (skipping any that
    * already carry one — re-adds keep their identity) from `snap`'s mark.
    * Returns the stamped adds plus the domain bump to commit alongside,
    * or no bump when nothing was assigned. Requires `numRecords` stats on
    * every assigned file (graft always records them). */
  def assignFreshRowIds(snap: Snapshot, adds: Seq[AddAction])
      : (Seq[AddAction], Option[DomainMetadataAction]) = {
    if (adds.forall(_.baseRowId.isDefined)) return (adds, None)
    var next = highWaterMark(snap) + 1
    val stamped = adds.map { a =>
      if (a.baseRowId.isDefined) a
      else {
        val n = a.stats.flatMap(ActionCodec.statsFromJson).map(_.numRecords)
          .getOrElse(throw new IllegalStateException(
            s"row tracking needs numRecords stats to allocate ids for ${a.path}"))
        val withId = a.copy(baseRowId = Some(next))
        next += n
        withId
      }
    }
    (stamped, Some(domainBump(next - 1)))
  }

  /** Loud refusal for operations that would reassign row identities. */
  def assertNoRewrite(snap: Snapshot, path: String, op: String): Unit =
    if (enabled(snap))
      throw new UnsupportedProtocolException(
        s"unsupported Delta table: $op on $path would move surviving rows " +
        "to new files, and graft does not materialize row ids into " +
        "rewritten files (rowTracking) — merge-on-read DV DELETE and " +
        "appends are supported")
}
