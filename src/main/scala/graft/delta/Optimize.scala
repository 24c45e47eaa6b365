package graft.delta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

final case class OptimizeMetrics(
    filesRemoved: Long, filesAdded: Long,
    bytesRemoved: Long, bytesAdded: Long,
    version: Long)

/** File compaction (OPTIMIZE): rewrite many small files into few large ones
  * without changing table contents.
  *
  * No counterpart in the reference at v0.4.1, but the protocol support it
  * rides on is there: compaction commits carry `dataChange = false`
  * (`rust/src/action.rs:166-170`) so log-tailing readers skip them — our
  * [[graft.streaming.DeltaTailer]] honors exactly that.
  *
  * Scale shape: the rewrite is a distributed read → repartition-by-partition
  * → write; the driver only lists files and commits. Like the reference's
  * transactions, conflict handling is optimistic blind-retry — running
  * OPTIMIZE concurrently with writers can race (the reference's own open
  * TODO, `rust/src/delta.rs:1306-1322`); run it from a maintenance job.
  */
object Optimize {

  /** Compact the (optionally partition-filtered) table. Small files are
    * grouped per partition; each partition's rows are rewritten into
    * `ceil(bytes / targetFileBytes)` files. Returns metrics; no-op when
    * nothing qualifies (fewer than 2 files in every partition). */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 256L * 1024 * 1024,
              partitionFilters: Seq[PartitionFilter] = Nil): OptimizeMetrics = {
    val log = DeltaLog.forPath(spark, path)
    val snap = log.update()
    if (snap.version < 0) throw new NotATableException(path)
    val partCols = snap.partitionColumns

    // candidate groups: >1 file in the same partition tuple
    val candidates = PartitionFilter.prune(snap.files, partitionFilters)
      .groupBy(a => partCols.map(c => a.partitionValues.get(c).orNull))
      .filter(_._2.size > 1)
    if (candidates.isEmpty)
      return OptimizeMetrics(0, 0, 0, 0, snap.version)

    val oldFiles = candidates.values.flatten.toSeq
    val dt = new DeltaTable(log, snap)

    // read exactly the candidate files (partition columns restored from the
    // hive layout via the index), repartition so each partition tuple lands
    // in few tasks, and stage the rewrite
    val index = new GraftFileIndex(spark, log, snap, Some(oldFiles))
    val df = {
      import org.apache.spark.sql.execution.datasources.HadoopFsRelation
      import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      val rel = HadoopFsRelation(index, index.partitionSchema, index.dataSchema,
        None, new ParquetFileFormat(), Map.empty)(spark)
      spark.baseRelationToDataFrame(rel)
        .select(snap.schema.fieldNames.map(col): _*)
    }
    val totalBytes = oldFiles.map(_.size).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val shaped =
      if (partCols.nonEmpty) df.repartition(math.max(nOut, candidates.size), partCols.map(col): _*)
      else df.repartition(nOut)

    val adds = GraftWriter.stageFiles(shaped, path, partCols)
      .map(_.copy(dataChange = false))
    val now = System.currentTimeMillis()
    val txn = log.startTransaction()
    oldFiles.foreach(f => txn.addAction(RemoveAction(
      path = f.path, deletionTimestamp = now, dataChange = false,
      extendedFileMetadata = Some(true),
      partitionValues = Some(f.partitionValues), size = Some(f.size))))
    txn.addActions(adds)
    val info = ActionCodec.mapper.createObjectNode()
    info.put("timestamp", now)
    info.put("operation", "OPTIMIZE")
    val params = info.putObject("operationParameters")
    params.put("targetFileBytes", targetFileBytes)
    params.put("numFilesRemoved", oldFiles.size)
    params.put("numFilesAdded", adds.size)
    val version = txn.commit(Some(CommitInfoAction(info)))
    OptimizeMetrics(
      filesRemoved = oldFiles.size, filesAdded = adds.size,
      bytesRemoved = totalBytes, bytesAdded = adds.map(_.size).sum,
      version = version)
  }
}
