package graft.streaming

import java.util.UUID

import org.apache.spark.sql.DataFrame

import graft.delta._

/** Exactly-once Structured Streaming sink for Delta tables, carried by
  * `writeStream.foreachBatch`.
  *
  * Idempotence is the reference's `txn` action protocol
  * (`rust/src/action.rs:607-616`, replay rule `rust/src/delta.rs:1437-1442`):
  * each committed micro-batch records `txn { appId, version = epochId }`;
  * on replay (failure/restart re-delivers a batch), the sink consults
  * `snapshot.appTransactionVersion(appId)` and skips epochs already
  * committed. Commit metadata mirrors `DeltaOperation::StreamingUpdate
  * { outputMode, queryId, epochId }` (`rust/src/action.rs:792-800`) with the
  * reference's OutputMode names (`rust/src/action.rs:818-826`).
  *
  * Usage:
  * {{{
  *   val sink = new GraftStreamSink(tablePath, appId = "my-stream")
  *   df.writeStream.foreachBatch(sink.writeBatch _).start()
  * }}}
  */
final class GraftStreamSink(
    tablePath: String,
    appId: String,
    partitionBy: Seq[String] = Nil,
    outputMode: String = "Append",
    queryId: String = UUID.randomUUID().toString,
    mergeSchema: Boolean = false) {

  // Validate BEFORE any epoch stages data: the same require used to sit
  // after stageFiles, so every start attempt of an unsupported-mode stream
  // orphaned a full micro-batch of parquet under the table (r12 review).
  require(outputMode == "Append" || outputMode == "Complete",
    s"graft-delta sink supports Append and Complete output modes, got $outputMode")

  /** Write one micro-batch transactionally; returns the committed version,
    * or -1 if the epoch was already committed (idempotent skip). */
  def writeBatch(batchIn: DataFrame, epochId: Long): Long = {
    val spark = batchIn.sparkSession
    val log = DeltaLog.forPath(spark, tablePath)
    val snap = log.update()

    // ST1: exactly-once gate
    if (snap.appTransactionVersion.get(appId).exists(_ >= epochId)) return -1L

    // omitted generated and identity columns are computed, like the batch
    // writer (identity high-water marks advance in this epoch's commit)
    val (batch, genIdentity) =
      if (snap.version >= 0)
        graft.delta.IdentityColumns.withIdentity(
          Constraints.withGenerated(batchIn, snap), snap)
      else (batchIn, Seq.empty[graft.delta.IdentityColumns.Info])

    // mapped tables: the same physical staging contract as the batch
    // writer (fence first — the protocol reason beats a schema mismatch)
    val mapped = snap.version >= 0 && ColumnMapping.isMapped(snap)
    if (snap.version >= 0)
      ProtocolSupport.assertWritable(snap, allowNameMapping = true)
    // the existing table's partitioning WINS, like the batch writer: an
    // omitted partitionBy inherits it (users rarely re-declare it per
    // stream), and a mismatch refuses — unpartitioned files committed
    // into a partitioned table scan as null partition values and vanish
    // under pruning
    val effPartitionBy =
      if (snap.version < 0) partitionBy
      else {
        val declared = snap.partitionColumns
        if (partitionBy.isEmpty) declared
        else {
          require(partitionBy == declared,
            s"stream partitionBy ${partitionBy.mkString("(", ",", ")")} != " +
            s"table partitioning ${declared.mkString("(", ",", ")")} of $tablePath")
          partitionBy
        }
      }

    var evolvedMetadata: Option[MetaDataAction] = None
    if (snap.version >= 0) {
      if (mergeSchema) {
        // mid-stream schema evolution: new nullable columns commit with
        // this epoch's metaData action, same contract as the batch writer
        // (mapped tables allocate physical names + ids inside evolveSchema)
        evolvedMetadata = GraftWriter.evolveSchema(snap, batch.schema)
      } else {
        // structural: nested nullability / field metadata (e.g. a mapped
        // table's columnMapping annotations) are not load-bearing
        def shape(s: org.apache.spark.sql.types.StructType) =
          s.fields.map(f => (f.name, DeltaSchema.structural(f.dataType))).toSeq
        val tbl = shape(graft.delta.DeltaSchema.normalize(snap.schema))
        val inc = shape(graft.delta.DeltaSchema.normalize(batch.schema))
        if (tbl != inc)
          throw new SchemaMismatchException(s"schema mismatch: table=$tbl batch=$inc")
      }
    }

    // guarded by `mapped`: a brand-new table has no metadata to read yet
    lazy val mapSchema = evolvedMetadata
      .map(em => DeltaSchema.fromJson(em.schemaString)).getOrElse(snap.schema)
    // stage in the table's at-rest timestamp flavor (see the batch writer)
    val atRest =
      if (snap.version < 0) batch
      else GraftWriter.alignTimestampFlavors(batch, evolvedMetadata
        .map(em => DeltaSchema.fromJson(em.schemaString)).getOrElse(snap.schema))
    val enforced = Constraints.enforce(atRest, snap)
    val staged =
      if (mapped) ColumnMapping.toPhysical(enforced, mapSchema,
        attachIds = ColumnMapping.mode(snap) == "id")
      else enforced
    val physPartitionBy =
      if (mapped) effPartitionBy.map(c => ColumnMapping.physicalName(mapSchema, c))
      else effPartitionBy
    val adds = GraftWriter.stageFiles(staged, tablePath, physPartitionBy)
    val now = System.currentTimeMillis()
    val txn = log.startTransaction(snap)
    if (mapped) txn.permitNameMappedCommit()
    // Append adds; Complete REPLACES the table contents each epoch (the
    // engine hands the full result per trigger — appending it would stack
    // N copies of the aggregate). Update has no sound file-level mapping
    // (mode validated in the constructor, before any staging I/O).
    if (outputMode == "Complete" && snap.version >= 0)
      snap.files.foreach(f => txn.addAction(RemoveAction(
        path = f.path, deletionTimestamp = now, dataChange = true,
        extendedFileMetadata = Some(true),
        partitionValues = Some(f.partitionValues), size = Some(f.size))))
    if (snap.version < 0) {
      // schema-gated feature fences at CREATE, like the batch writer: an
      // NTZ (or variant) column in the first epoch must declare its
      // reader+writer feature alongside the schema that carries it
      txn.addAction(ProtocolSupport.configFences(
        Map.empty, ProtocolAction(), Some(batch.schema)))
      txn.addAction(MetaDataAction(
        id = UUID.randomUUID().toString, name = None, description = None,
        format = Format(), schemaString = DeltaSchema.toJson(batch.schema),
        partitionColumns = partitionBy, createdTime = Some(now),
        configuration = Map.empty))
    } else evolvedMetadata.foreach { md =>
      // mergeSchema evolution can introduce feature-gated types mid-stream
      // (NTZ, variant) — fence them like GraftWriter's evolution commit
      // does; one folded action, emitted only when the protocol changes
      val protoBase = ProtocolAction(snap.minReaderVersion,
        snap.minWriterVersion, snap.readerFeatures, snap.writerFeatures)
      val fenced = ProtocolSupport.configFences(md.configuration, protoBase,
        Some(DeltaSchema.fromJson(md.schemaString)))
      if (fenced != protoBase) txn.addAction(fenced)
    }
    txn.addAction(TxnAction(appId, epochId, Some(now)))
    val finalAdds =
      if (snap.version >= 0 && graft.delta.RowTracking.enabled(snap)) {
        val (stamped, bump) = graft.delta.RowTracking.assignFreshRowIds(snap, adds)
        bump.foreach(txn.addAction)
        stamped
      } else adds
    txn.addActions(finalAdds)
    // identity marks FOLD into the epoch's evolved metaData (at most one
    // metaData action per commit — same contract as the batch writer)
    val identityMd =
      if (genIdentity.isEmpty) None
      else {
        val baseMd = evolvedMetadata.orElse(snap.metadata).getOrElse(
          throw new IllegalStateException("identity table without metadata"))
        val phys: String => String =
          if (mapped) c => graft.delta.ColumnMapping.physicalName(mapSchema, c)
          else identity
        graft.delta.IdentityColumns
          .highWaterMarkMetadata(baseMd, genIdentity, adds, phys)
      }
    (identityMd orElse evolvedMetadata).foreach(txn.addAction)

    // ST2: StreamingUpdate commit provenance
    val info = ActionCodec.mapper.createObjectNode()
    info.put("timestamp", now)
    info.put("operation", "STREAMING UPDATE")
    val params = info.putObject("operationParameters")
    params.put("outputMode", outputMode)
    params.put("queryId", queryId)
    params.put("epochId", epochId)
    val version =
      try txn.commit(Some(CommitInfoAction(info)))
      catch {
        case e: ConcurrentTransactionException =>
          // a racing writer of the SAME appId committed while we staged
          // (zombie driver during failover). Re-check the gate: if it
          // covered our epoch, this delivery is a duplicate — skip it
          // (our staged files stay uncommitted orphans for vacuum);
          // otherwise the race was a different epoch and must surface.
          if (log.update().appTransactionVersion.get(appId).exists(_ >= epochId))
            return -1L
          else throw e
      }
    log.maybeCheckpoint(version)
    version
  }
}
