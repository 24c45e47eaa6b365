package graft.delta

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

final case class DmlMetrics(filesRewritten: Long, rowsAffected: Long, version: Long)

/** Copy-on-write DML: DELETE and UPDATE by predicate.
  *
  * Beyond the reference (delta-rs v0.4.1 is read/append/overwrite only), but
  * protocol-pure: both operations are remove+add commits over exactly the
  * files that contain affected rows.
  *
  * Scale shape:
  *  1. affected-file detection is a distributed scan with the predicate
  *     pushed down (`input_file_name()` over the pruned FileIndex scan —
  *     partition pruning, stats skipping, and parquet row-group skipping
  *     all narrow it before any row is read);
  *  2. only affected files are rewritten (distributed), untouched files'
  *     Add entries are carried over;
  *  3. one optimistic commit. Blind-retry concurrency, like every write
  *     here and in the reference (`rust/src/delta.rs:1306-1322` TODO).
  */
object Dml {

  /** DELETE FROM table WHERE predicate. Rows where the predicate is NULL
    * are kept (SQL semantics). */
  def delete(spark: SparkSession, path: String, predicate: Column): DmlMetrics =
    rewrite(spark, path, predicate, "DELETE", df => df, keepMatches = false)

  /** UPDATE table SET assignments WHERE predicate. */
  def update(spark: SparkSession, path: String, predicate: Column,
             assignments: Map[String, Column]): DmlMetrics =
    rewrite(spark, path, predicate, "UPDATE", df => {
      val matches = coalesce(predicate, lit(false))
      assignments.foldLeft(df) { case (d, (name, value)) =>
        d.withColumn(name, when(matches, value).otherwise(col(name)))
      }
    }, keepMatches = true)

  private def rewrite(spark: SparkSession, path: String, predicate: Column,
                      operation: String,
                      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                      keepMatches: Boolean): DmlMetrics = {
    val log = DeltaLog.forPath(spark, path)
    val snap = log.update()
    if (snap.version < 0) throw new NotATableException(path)
    // fail before staging any rewrite files (the commit-time gate would
    // catch it too, but only after the wasted write)
    if (TableConfig.appendOnly(TableConfig.of(snap)))
      throw new AppendOnlyTableException(path)
    val dt = new DeltaTable(log, snap)

    // 1. which files contain matching rows? (predicate pushed into the scan)
    val affectedUris = dt.toDF.filter(predicate)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    val affected = matchFiles(log, snap, affectedUris)
    if (affected.isEmpty) return DmlMetrics(0, 0, snap.version)

    // 2. rewrite only the affected files — ONE pass over them. Metrics ride
    // along instead of re-scanning: DELETE's affected-row count is
    // (before − after) where `before` comes from the snapshot's footer
    // stats and `after` from the written files' footers; UPDATE's matched
    // count is an observed aggregate collected during the write itself.
    val affectedDf = scanSubset(spark, log, snap, affected)
    val beforeFromStats: Option[Long] = {
      val counts = affected.map(_.stats.flatMap(ActionCodec.statsFromJson).map(_.numRecords))
      if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
    }
    val metricName = s"graft_dml_${java.util.UUID.randomUUID()}"
    val rewritten =
      if (keepMatches)
        // observe BEFORE the transform: the predicate must see pre-update
        // values (post-transform the assignments may have falsified it)
        transform(affectedDf.observe(metricName,
          coalesce(sum(when(coalesce(predicate, lit(false)), 1L)), lit(0L)).as("matched")))
      else affectedDf.filter(!coalesce(predicate, lit(false)))
    // only UPDATE carries an observed metric; DELETE must not wait on one
    val checked = Constraints.enforce(rewritten, snap)
    val (adds, observed) =
      if (keepMatches)
        ObservedMetrics.run(spark, metricName) {
          GraftWriter.stageFiles(checked, path, snap.partitionColumns)
        }
      else
        (GraftWriter.stageFiles(checked, path, snap.partitionColumns), None)
    val afterRows = adds.flatMap(_.stats.flatMap(ActionCodec.statsFromJson))
      .map(_.numRecords).sum
    val rowsAffected =
      if (keepMatches)
        observed.map(_.getAs[Long]("matched")).getOrElse(
          // metrics did not surface (listener starvation): recompute
          affectedDf.filter(coalesce(predicate, lit(false))).count())
      else
        beforeFromStats.getOrElse(affectedDf.count()) - afterRows

    // 3. one commit: remove affected, add rewrites. The predicate's
    // partition-column projection becomes the declared read domain, so
    // concurrent adds in disjoint partitions commute instead of aborting us.
    val now = System.currentTimeMillis()
    val txn = log.startTransaction().withReadFilters(
      PartitionFilter.fromCatalyst(
        org.apache.spark.sql.graftbridge.ColumnBridge.catalystExpression(predicate),
        snap.partitionColumns))
    affected.foreach(f => txn.addAction(RemoveAction(
      path = f.path, deletionTimestamp = now, dataChange = true,
      extendedFileMetadata = Some(true),
      partitionValues = Some(f.partitionValues), size = Some(f.size))))
    txn.addActions(adds)
    val info = ActionCodec.mapper.createObjectNode()
    info.put("timestamp", now)
    info.put("operation", operation)
    val params = info.putObject("operationParameters")
    params.put("predicate", predicate.toString)
    params.put("numFilesRewritten", affected.size)
    val version = txn.commit(Some(CommitInfoAction(info)))
    DmlMetrics(affected.size, rowsAffected, version)
  }

  /** Resolve `input_file_name()` URIs back to the snapshot's Add entries
    * (the URIs are absolute and %-encoded; Add paths are table-relative). */
  private[delta] def matchFiles(log: DeltaLog, snap: Snapshot,
                                uris: Set[String]): Seq[AddAction] =
    snap.files.filter { a =>
      val abs = new org.apache.hadoop.fs.Path(log.tablePath, a.path).toUri.getPath
      uris.exists(u => java.net.URLDecoder.decode(u, "UTF-8").endsWith(abs) ||
        u.endsWith(a.path))
    }

  /** Scan only `files` of the snapshot, in table-schema column order.
    * Distributed parquet read through the same FileIndex as a full scan. */
  private[delta] def scanSubset(spark: SparkSession, log: DeltaLog,
                                snap: Snapshot, files: Seq[AddAction]) = {
    import org.apache.spark.sql.execution.datasources.HadoopFsRelation
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val index = new GraftFileIndex(spark, log, snap, Some(files))
    val rel = HadoopFsRelation(index, index.partitionSchema, index.dataSchema,
      None, new ParquetFileFormat(), Map.empty)(spark)
    spark.baseRelationToDataFrame(rel).select(snap.schema.fieldNames.map(col): _*)
  }
}
