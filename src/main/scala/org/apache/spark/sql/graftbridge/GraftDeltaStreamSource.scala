package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

import graft.delta.{AddAction, DeltaLog}

/** V1 Structured Streaming source tailing a Delta transaction log — the
  * reference's "stream table update" (`update_incremental` polling,
  * `rust/src/delta.rs:635-638`) as a first-class `readStream` source.
  *
  * Offsets are table versions: each micro-batch reads the files added in
  * `(startVersion, endVersion]` with `dataChange = true` (compaction
  * commits are invisible, `rust/src/action.rs:166-170`). Offset tracking +
  * the checkpointLocation give end-to-end exactly-once with the
  * `graft-delta` sink's txn idempotence.
  *
  * Admission control is version-granular by construction — an offset must
  * identify a commit boundary, never half a commit, or restart replay would
  * duplicate rows. `maxVersionsPerTrigger` caps versions per batch;
  * `maxFilesPerTrigger` / `maxBytesPerTrigger` walk the pending commits in
  * order and stop *before* the commit that would cross the cap (always
  * admitting at least one version, so a single oversized commit cannot
  * stall the stream). `startingVersion` pins where a fresh query (no
  * checkpoint yet) begins — the backfill-skip knob for subscribing to a
  * long-lived table's tail.
  *
  * Lives in the bridge package because the V1 `Source`/`Offset` interfaces
  * are `private[sql]`; all Delta-log logic stays in `graft.delta`.
  */
final class GraftDeltaStreamSource(
    spark: SparkSession,
    log: DeltaLog,
    override val schema: StructType,
    maxVersionsPerTrigger: Option[Long] = None,
    maxFilesPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    startingVersion: Option[Long] = None,
    metadataPath: Option[String] = None,
    ignoreChanges: Boolean = false,
    ignoreDeletes: Boolean = false,
    readChangeFeed: Boolean = false) extends Source {

  // Capability fence at stream START: the table's STANDING protocol must
  // be readable before any batch serves. Per-commit fences
  // (assertCommitServable) only see capability flips that arrive DURING
  // the stream — a table whose base protocol already requires unsupported
  // reader features would otherwise stream misread rows that a batch scan
  // refuses (GraftFileIndex fences; this source builds its own scans).
  {
    val s = log.update()
    if (s.version >= 0) graft.delta.ProtocolSupport.assertRowFeedReadable(s)
  }

  // Column mapping: a name-mapped table's files speak PHYSICAL names, so
  // every batch scans physical and aliases back to the declared logical
  // schema (same single-conversion shape as the table scan); mode=id rides
  // the same path with parquet field-id matching (physicalReadSchema
  // attaches the ids and enables the matcher). A mid-stream ENABLE still
  // fails per commit (assertCommitServable) — the physical layout under a
  // running stream's fixed schema must not change.
  private val mappedTableFields: Option[Map[String, org.apache.spark.sql.types.StructField]] = {
    val snap = log.snapshot
    graft.delta.ColumnMapping.mode(snap) match {
      case "none" => None
      case "name" | "id" =>
        val byName = snap.schema.fields.map(f => f.name -> f).toMap
        val unknown = schema.fields.map(_.name)
          .filterNot(n => n == graft.delta.ChangeDataFeed.ChangeType ||
            n == graft.delta.ChangeDataFeed.CommitVersion || byName.contains(n))
        if (unknown.nonEmpty) throw new graft.delta.UnsupportedProtocolException(
          s"declared stream schema columns ${unknown.mkString("[", ", ", "]")} " +
          s"do not exist on the column-mapped table ${log.tablePath}; there " +
          "is no physical column to serve them from")
        Some(byName)
      case other => throw new graft.delta.UnsupportedProtocolException(
        s"streaming over ${log.tablePath} with column mapping mode '$other' " +
        "is not implemented (graft reads name- and id-mapped tables)")
    }
  }

  /** Physical read schema for a field subset, id-aware: restates
    * `delta.columnMapping.id` as parquet field ids and enables Spark's
    * matcher on id-mapped tables ([[graft.delta.ColumnMapping.readSchema]]
    * semantics over an arbitrary subset of the table's fields). */
  private def physicalReadSchema(fields: Seq[org.apache.spark.sql.types.StructField])
      : org.apache.spark.sql.types.StructType = {
    val ids = graft.delta.ColumnMapping.mode(log.snapshot) == "id"
    if (ids) spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    graft.delta.ColumnMapping.physicalSchema(StructType(fields), ids)
  }

  /** Alias a physically-scanned frame back to the declared columns in
    * `names` order (change-feed metadata columns pass through by name). */
  private def aliasToLogical(df: DataFrame, names: Seq[String]): DataFrame = {
    val byName = mappedTableFields.get
    df.select(names.map { n =>
      if (n == graft.delta.ChangeDataFeed.ChangeType ||
          n == graft.delta.ChangeDataFeed.CommitVersion) df.col(s"`$n`")
      else {
        val f = byName(n)
        val phys = graft.delta.ColumnMapping.physicalFieldName(f)
        df.col(s"`$phys`").cast(f.dataType).as(n)
      }
    }: _*)
  }

  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  /** Versions at or below this are never served (fresh queries only; a
    * checkpointed offset takes precedence on restart). */
  private val floor: Long = startingVersion.map(_ - 1).getOrElse(-1L)

  private val throttled =
    maxVersionsPerTrigger.nonEmpty || maxFilesPerTrigger.nonEmpty || maxBytesPerTrigger.nonEmpty

  // The throttle anchor must survive restarts: on a restart whose last batch
  // COMMITTED, the engine calls getOffset before any getBatch, so an anchor
  // that reset to `floor` would rate-limit to an offset BELOW the
  // checkpointed one — the offset log then regresses and later batches
  // re-serve already-processed versions (duplicates). Persist the anchor in
  // the per-source checkpoint dir Spark hands us (`metadataPath`), the same
  // place FileStreamSource keeps its seen-files log. Only driver-side
  // single-writer access, so a plain overwrite-via-rename suffices.
  private val anchorFile: Option[org.apache.hadoop.fs.Path] =
    metadataPath.filter(_ => throttled)
      .map(p => new org.apache.hadoop.fs.Path(p, "graft-throttle-anchor"))
  private lazy val anchorFs = anchorFile.map(
    _.getFileSystem(spark.sessionState.newHadoopConf()))

  /** Anchor persistence is value-in-NAME (`graft-throttle-anchor.<v>`),
    * written create-new FIRST and with older anchors deleted AFTER: the
    * previous delete-then-rename scheme had a crash window that lost the
    * anchor entirely, regressing offsets and re-serving committed
    * versions on restart (r12 review). Offsets are monotonic, so the
    * reader's max-over-suffixes is correct even when a crash leaves
    * several anchor files; a torn write cannot corrupt a value that
    * lives in the file NAME. The legacy content-bearing file is still
    * read for checkpoints written by older builds. */
  private def anchorPeers(): Seq[org.apache.hadoop.fs.Path] =
    anchorFile.toSeq.flatMap { p =>
      val fs = anchorFs.get
      if (!fs.exists(p.getParent)) Nil
      else fs.listStatus(p.getParent).toSeq.map(_.getPath)
        .filter(_.getName.startsWith(p.getName + "."))
        .filter(_.getName.stripPrefix(p.getName + ".").forall(_.isDigit))
    }

  private def readAnchor(): Option[Long] =
    anchorFile.flatMap { p =>
      try {
        val suffixed = anchorPeers()
          .map(_.getName.stripPrefix(p.getName + ".").toLong)
        val legacy =
          if (!anchorFs.get.exists(p)) None
          else {
            val in = anchorFs.get.open(p)
            try Some(new String(
              org.apache.commons.io.IOUtils.toByteArray(in),
              java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
            finally in.close()
          }
        (suffixed ++ legacy).maxOption
      } catch { case scala.util.control.NonFatal(_) => None } // corrupt → floor
    }

  private def persistAnchor(v: Long): Unit =
    anchorFile.foreach { p =>
      try {
        val fs = anchorFs.get
        val suffixOf = (n: String) => n.stripPrefix(p.getName + ".").toLong
        // ONE listing serves both the zombie guard and the reclaim filter —
        // this runs per trigger, and a second LIST doubles checkpoint-dir
        // RPCs on an object store. A peer appearing between this listing
        // and the reclaim is only ever OUR `next` (other writers are
        // zombies by definition and would be writing lower versions).
        val peers = anchorPeers()
        // a zombie driver (failover) may race here with a STALE v: never
        // delete a peer recording a higher version, and skip the write
        // entirely when one exists — readAnchor takes max-over-suffixes,
        // so the live driver's floor survives the zombie (r12 ADVICE)
        // The strictly-higher case stays fully conservative (no write, no
        // reclaim): there WE are the zombie, and cleanup belongs to the
        // live driver whose reclaim we must not race. At equal suffix (a
        // restart replaying the same version) the write is skipped but the
        // reclaim still runs — otherwise lower anchors and the legacy file
        // (post-crash garbage) linger until the offered version advances
        // (r13 advice); deleting strictly-lower suffixes is safe under
        // max-over-suffixes because an anchor at v survives as the floor.
        val hasHigher = peers.exists(q => suffixOf(q.getName) > v)
        if (!hasHigher) {
          if (!peers.exists(q => suffixOf(q.getName) == v)) {
            val next = new org.apache.hadoop.fs.Path(p.getParent, s"${p.getName}.$v")
            val out = fs.create(next, true)
            try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
          }
          // reclaim strictly-LOWER anchors (and the legacy file) only once
          // an anchor at v exists — every crash point leaves at least one
          peers.filter(q => suffixOf(q.getName) < v)
            .foreach(fs.delete(_, false))
          if (fs.exists(p)) fs.delete(p, false)
        }
      } catch { case scala.util.control.NonFatal(_) => () } // stale anchor is safe; lost is not, hence write-first
    }

  /** Highest version already offered as a batch end — the throttle anchor.
    * `floor` on a fresh query; recovered from the persisted anchor (and,
    * defensively, from getBatch's offsets) after a restart. */
  @volatile private var lastOffered: Long =
    math.max(floor, readAnchor().getOrElse(floor))

  /** Servable adds of one commit, through the shared append-feed guard
    * ([[graft.delta.RewriteFence]]): copy-on-write rewrites, delete-only
    * commits, and merge-on-read (DV) DML all fail loudly without the
    * matching ignoreChanges/ignoreDeletes opt-in (r6 ADVICE). */
  /** The stream's fixed DATA schema for the mid-stream schema-change
    * fence — None on mapped tables (they resolve by immutable PHYSICAL
    * names, so logical renames stay servable). */
  private def fenceSchema: Option[StructType] =
    if (mappedTableFields.isDefined) None
    else Some(StructType(schema.fields.filterNot(f =>
      f.name == graft.delta.ChangeDataFeed.ChangeType ||
      f.name == graft.delta.ChangeDataFeed.CommitVersion)))

  // Commits are immutable, but one trigger reads the same versions in
  // getOffset's throttle walk and again in getBatch (CDF mode a third
  // time in its fence loop) — two to three FS round trips per commit per
  // trigger on an object store (r12 review). A bounded LRU collapses them.
  private val commitCache =
    new java.util.LinkedHashMap[Long, Seq[graft.delta.Action]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, Seq[graft.delta.Action]]): Boolean =
        size() > 512
    }
  private def commitActionsOf(v: Long): Seq[graft.delta.Action] =
    commitCache.synchronized {
      val hit = commitCache.get(v)
      if (hit != null) hit
      else { val a = log.readCommit(v); commitCache.put(v, a); a }
    }

  private def dataChangeAdds(version: Long): Seq[AddAction] =
    graft.delta.RewriteFence.servableAdds(
      log.tablePath.toString, version, commitActionsOf(version),
      ignoreChanges, ignoreDeletes,
      allowNameMapping = mappedTableFields.isDefined,
      declaredSchema = fenceSchema)

  override def getOffset: Option[V1Offset] = {
    val latest = log.update().version
    if (latest < 0 || latest <= lastOffered) {
      if (latest < 0) None else Some(LongOffset(lastOffered))
    } else {
      // Rate limiting: a backfill over a 10⁴-version history must not land
      // in one micro-batch.
      val byVersions = maxVersionsPerTrigger match {
        case Some(max) => math.min(latest, lastOffered + max)
        case None => latest
      }
      val end =
        // CDF mode serves row-level changes, not files — only the version
        // cap applies (the file/byte walk would also trip the append-stream
        // rewrite fence, which CDF mode exists to make unnecessary)
        if (readChangeFeed || (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty)) byVersions
        else {
          // walk pending commits in order; stop before the cap-crossing
          // one, and stop READING once anything was admitted and the next
          // commit either crosses the cap or fails its serve fence — a
          // poison commit beyond the cap must not kill the stream before
          // the servable prefix is offered (it fails loudly on the trigger
          // AFTER that prefix commits)
          var files = 0L; var bytes = 0L
          var end = lastOffered
          val pending = log.listCommitVersions()
            .filter(v => v > lastOffered && v <= byVersions)
          val it = pending.iterator
          var stop = false
          while (it.hasNext && !stop) {
            val v = it.next()
            val adds =
              try dataChangeAdds(v)
              catch {
                // NonFatal only: an OOM/VM error must propagate, not read
                // as "next commit unservable" (r12 review)
                case scala.util.control.NonFatal(e) =>
                  if (end > lastOffered) { stop = true; Nil }
                  else throw e
              }
            if (!stop) {
              files += adds.size
              bytes += adds.map(_.size).sum
              val over = maxFilesPerTrigger.exists(files > _) ||
                maxBytesPerTrigger.exists(bytes > _)
              if (over && end > lastOffered) stop = true // keep at least one
              else {
                end = v
                // one oversized commit admitted alone: nothing more fits
                if (over) stop = true
              }
            }
          }
          end
        }
      if (end <= lastOffered) Some(LongOffset(lastOffered))
      else {
        lastOffered = end
        persistAnchor(end)
        Some(LongOffset(end))
      }
    }
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    // the checkpointed offset takes PRECEDENCE over startingVersion (the
    // floor exists for fresh queries only): max(start, floor) would let a
    // raised startingVersion silently skip committed-but-unserved versions
    // on restart (r12 review)
    val startV = start.map(versionOf).getOrElse(floor)
    val endV = versionOf(end)
    // start is the engine's checkpointed offset on a restart replay — a
    // second recovery path for the throttle anchor alongside the persisted
    // file (covers a lost anchor write when the last batch was uncommitted)
    if (math.max(startV, endV) > lastOffered) {
      lastOffered = math.max(startV, endV)
      persistAnchor(lastOffered)
    }
    // CDF mode: serve row-level changes from _change_data (+ synthesized
    // insert/delete rows for plain appends/truncates) instead of file adds —
    // the streaming analog of `graft_table_changes`. DML commits yield
    // pre/post images tagged `_change_type`/`_commit_version`; offsets stay
    // commit boundaries, and a restart replay re-reads the identical
    // deterministic change set for (startV, endV].
    if (readChangeFeed) {
      // per-commit capability fence — the non-CDF path gets this inside
      // RewriteFence.servableAdds; CDF mode must equally refuse a range
      // whose commits flip the table into territory the stream's fixed
      // schema cannot serve (mid-stream column-mapping enable, a protocol
      // bump past supported reader features)
      log.listCommitVersions().filter(v => v > startV && v <= endV).foreach(v =>
        graft.delta.ProtocolSupport.assertCommitServable(
          log.tablePath.toString, v, commitActionsOf(v),
          allowNameMapping = mappedTableFields.isDefined,
          declaredSchema = fenceSchema))
      // table schema = declared minus the two change columns BY NAME —
      // a user-supplied .schema() may place them anywhere (r7 ADVICE);
      // passing it skips a full snapshotForVersion replay per micro-batch
      val dataFields = StructType(schema.fields.filterNot(f =>
        f.name == graft.delta.ChangeDataFeed.ChangeType ||
        f.name == graft.delta.ChangeDataFeed.CommitVersion))
      val changes =
        if (endV <= startV)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else mappedTableFields match {
          case Some(byName) =>
            // scan physical, alias to the declared order in one projection
            aliasToLogical(
              graft.delta.ChangeDataFeed.readChanges(spark, log, startV, endV,
                physicalReadSchema(dataFields.fields.toSeq.map(f => byName(f.name)))),
              schema.fieldNames.toSeq)
          case None =>
            graft.delta.ChangeDataFeed.readChanges(spark, log, startV, endV, dataFields)
              // align row layout to the DECLARED column order before the raw
              // internal-row handoff below, which relabels without reordering
              .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
        }
      return spark.internalCreateDataFrame(
        changes.queryExecution.toRdd, schema, isStreaming = true)
    }
    val adds: Seq[AddAction] = log.listCommitVersions()
      .filter(v => v > startV && v <= endV)
      .flatMap(dataChangeAdds)
    val batch =
      if (adds.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        val paths = adds.map(a =>
          new org.apache.hadoop.fs.Path(log.tablePath, a.path).toString)
        mappedTableFields match {
          case Some(byName) =>
            aliasToLogical(
              spark.read.option("basePath", log.tablePath.toString)
                .schema(physicalReadSchema(
                  schema.fields.toSeq.map(f => byName(f.name))))
                .parquet(paths: _*),
              schema.fieldNames.toSeq)
          case None =>
            spark.read
              .option("basePath", log.tablePath.toString)
              .schema(schema)
              .parquet(paths: _*)
              // Spark moves hive-partition columns to the END of the
              // relation schema even under an explicit .schema() (probed
              // r12) — re-select to the DECLARED order before the raw
              // internal-row relabel below, or a partitioned table whose
              // partition column is not last serves scrambled columns
              .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
        }
      }
    // streaming-tagged DataFrame over the same (lazy) rows, as file/kafka
    // sources do
    spark.internalCreateDataFrame(batch.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftDeltaStreamSource[${log.tablePath}]"
}
