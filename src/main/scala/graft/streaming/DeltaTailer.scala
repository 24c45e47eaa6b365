package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.delta._

/** Polling micro-batch *source* over a Delta table — the reference's
  * "stream table update" capability (`update_incremental` polling,
  * `rust/src/delta.rs:635-638`; README.adoc feature table): tail the
  * transaction log and emit each new version's added rows as a batch.
  *
  * Honors `dataChange = false` (`rust/src/action.rs:166-170`): files added
  * by compaction/optimize commits carry no new rows and are skipped, so
  * downstream consumers never double-read rewritten data.
  *
  * Driver-side state is one long (the last version seen); each poll reads
  * only the new commit files, never replays history — O(new commits), like
  * the reference's incremental update.
  *
  * Same append-feed contract as the first-class `readStream` source
  * ([[graft.delta.RewriteFence]]): rewrite / delete / DV-DML commits fail
  * loudly unless `ignoreChanges` / `ignoreDeletes` opt in — a tailer that
  * silently re-served a rewrite's survivors (or skipped deletions) would
  * corrupt its consumer just the same.
  */
final class DeltaTailer(log: DeltaLog, startAfterVersion: Long = -1L,
                        ignoreChanges: Boolean = false,
                        ignoreDeletes: Boolean = false) {

  @volatile private var lastSeen: Long = startAfterVersion

  def lastSeenVersion: Long = lastSeen

  /** Added files of versions in `(lastSeen, latest]` with dataChange=true. */
  private def newAdds(upTo: Long, allowNameMapping: Boolean): Seq[AddAction] =
    log.listCommitVersions()
      .filter(v => v > lastSeen && v <= upTo)
      .flatMap(v => graft.delta.RewriteFence.servableAdds(
        log.tablePath.toString, v, log.readCommit(v),
        ignoreChanges, ignoreDeletes, allowNameMapping))

  /** Poll once: Some((version, batch)) when the log advanced, None when idle.
    * The batch contains exactly the rows added since the last poll. */
  def nextBatch(): Option[(Long, DataFrame)] = synchronized {
    val snap = log.update()
    // STANDING-protocol fence per poll: the per-commit fence inside
    // servableAdds only sees capability flips that arrive as commit
    // actions — a table whose base protocol already demands unsupported
    // reader features must refuse here, as every batch scan does (r12
    // review; the readStream source carries the same start-time fence).
    if (snap.version >= 0) ProtocolSupport.assertRowFeedReadable(snap)
    if (snap.version <= lastSeen) None
    else {
      // name-mapped tables: the batch scans PHYSICAL names and aliases
      // back to logical; the snapshot is re-read per poll, so a logical
      // rename between polls serves subsequent batches under the new names
      val mapped = ColumnMapping.isMapped(snap)
      val adds = newAdds(snap.version, allowNameMapping = mapped)
      val schema = snap.schema
      val df =
        if (adds.isEmpty)
          log.spark.createDataFrame(
            log.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else {
          val paths = adds.map(a =>
            new org.apache.hadoop.fs.Path(log.tablePath, a.path).toString)
          if (mapped) {
            val phys = log.spark.read
              .option("basePath", log.tablePath.toString)
              .schema(ColumnMapping.readSchema(log.spark, snap))
              .parquet(paths: _*)
            phys.select(schema.fields.toSeq.map { f =>
              val p = ColumnMapping.physicalFieldName(f)
              phys.col(s"`$p`").cast(f.dataType).as(f.name)
            }: _*)
          } else
            log.spark.read
              .option("basePath", log.tablePath.toString)
              .schema(schema)
              .parquet(paths: _*)
              // Spark appends hive-partition columns to the END of the
              // relation even under an explicit schema (probed r12) —
              // re-select so every poll's column order matches the empty
              // and mapped batches (snap.schema order)
              .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
        }
      val version = snap.version
      lastSeen = version
      Some((version, df))
    }
  }
}

object DeltaTailer {
  /** Tail from the current end of the log (only future commits). */
  def fromLatest(log: DeltaLog): DeltaTailer =
    new DeltaTailer(log, log.update().version)

  /** Tail from the beginning (replays all data as the first batch). */
  def fromStart(log: DeltaLog): DeltaTailer = new DeltaTailer(log, -1L)
}
