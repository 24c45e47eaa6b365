package graft.delta

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
import org.apache.spark.sql.functions.col

/** Routes `INSERT INTO` / `INSERT OVERWRITE` on a **partitioned** graft-delta
  * catalog table through the transaction log.
  *
  * Non-partitioned tables are covered extension-free: the analyzer plans
  * them as `InsertIntoDataSourceCommand` via [[GraftDeltaRelation]]'s
  * `InsertableRelation`. A partition spec, however, forces Spark's V1
  * analysis down the `InsertIntoHadoopFsRelationCommand` branch, which
  * writes parquet straight into the table directory with no log commit.
  * This post-hoc resolution rule (registered by [[GraftSparkExtensions]],
  * running after Spark's own `DataSourceAnalysis` has aligned and cast the
  * query columns) swaps that command for a log-committing one — the same
  * contract as Delta Lake, whose session extension is likewise required
  * for correct SQL DML. Sessions without the extension fail fast instead:
  * [[GraftParquetFileFormat.prepareWrite]] throws before any file lands.
  */
object GraftDeltaInserts extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case c: InsertIntoHadoopFsRelationCommand
        if c.fileIndex.exists(_.isInstanceOf[GraftFileIndex]) =>
      // static partition values are already folded into the query as
      // literal columns by PreprocessTableInsertion; the spec is still
      // needed to scope an INSERT OVERWRITE to the named partitions
      GraftInsertCommand(c.fileIndex.get.asInstanceOf[GraftFileIndex],
        c.query, c.mode, c.outputColumnNames, c.staticPartitions)
  }

  /** The one transactional insert both SQL surfaces share (the V1
    * [[GraftInsertCommand]] swap and the catalog's v2 `V1Write` funnel):
    * stage parquet, then one commit of remove+add actions. `ordered` must
    * already be in the table's declared column order. */
  private[delta] def commitInsert(session: SparkSession, log: DeltaLog,
                                  ordered: org.apache.spark.sql.DataFrame,
                                  overwrite: Boolean,
                                  staticPartitions: Map[String, String],
                                  dynamicMode: Boolean): Long = {
    val snap = log.update()
    val txn = log.startTransaction()
    // mapped tables: stage under at-rest names (+ footer ids under
    // mode=id); the SQL-side partition spec speaks logical names while
    // add.partitionValues is keyed physically
    val mapped = ColumnMapping.isMapped(snap)
    if (mapped) txn.permitNameMappedCommit()
    def phys(c: String): String =
      if (mapped) ColumnMapping.physicalName(snap.schema, c) else c
    // constraints speak logical names — enforce BEFORE the physical rename
    val enforced = Constraints.enforce(ordered, snap)
    val staged =
      if (mapped) ColumnMapping.toPhysical(enforced, snap.schema,
        attachIds = ColumnMapping.mode(snap) == "id")
      else enforced
    val adds = GraftWriter.stageFiles(staged,
      log.tablePath.toString, snap.partitionColumns.map(phys))
    val removes: Seq[AddAction] =
      if (!overwrite) Nil
      else if (staticPartitions.nonEmpty)
        snap.files.filter(f => staticPartitions.forall { case (k, v) =>
          f.partitionValues.get(phys(k)).contains(v)
        })
      else if (snap.partitionColumns.nonEmpty && dynamicMode) {
        val touched = adds.map(_.partitionValues).toSet
        snap.files.filter(f => touched.contains(f.partitionValues))
      } else snap.files

    // CDF: an overwrite is a rewrite-shaped commit; without images the
    // feed would fail loudly for this version
    val cdcActions = ChangeDataFeed.stageOverwrite(session, log, snap, removes, adds)

    val now = System.currentTimeMillis()
    removes.foreach(f => txn.addAction(RemoveAction(
      path = f.path, deletionTimestamp = now, dataChange = true,
      extendedFileMetadata = Some(true),
      partitionValues = Some(f.partitionValues), size = Some(f.size))))
    txn.addActions(adds)
    txn.addActions(cdcActions)
    val info = ActionCodec.mapper.createObjectNode()
    info.put("timestamp", now)
    info.put("operation", "WRITE")
    val params = info.putObject("operationParameters")
    params.put("mode", if (overwrite) "Overwrite" else "Append")
    if (staticPartitions.nonEmpty)
      params.put("staticPartitions",
        staticPartitions.map { case (k, v) => s"$k=$v" }.mkString(","))
    val version =
      try txn.commit(Some(CommitInfoAction(info)))
      catch {
        case e: Throwable =>
          try GraftWriter.discardStaged(session, log.tablePath.toString, adds)
          catch { case _: Exception => () }
          ChangeDataFeed.discardStaged(session, log, cdcActions)
          throw e
      }
    log.maybeCheckpoint(version)
    log.update()
    version
  }
}

/** Transactional replacement for `InsertIntoHadoopFsRelationCommand` over a
  * graft-delta table: stage parquet + commit remove/add actions. The
  * incoming `query` is already column-aligned and cast by Spark's V1 insert
  * preprocessing (static partition values included as literal columns);
  * `outputColumnNames` names its output positionally.
  *
  * Overwrite scoping matches Spark's file-source semantics, expressed as
  * log actions instead of directory deletes:
  *  - static `PARTITION (p=…)` spec → only files matching the spec are
  *    removed;
  *  - `partitionOverwriteMode=dynamic` → only partitions receiving new
  *    data are removed;
  *  - plain overwrite → the whole table is replaced. */
final case class GraftInsertCommand(
    index: GraftFileIndex, query: LogicalPlan, mode: SaveMode,
    outputColumnNames: Seq[String],
    staticPartitions: Map[String, String]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    if (!index.live) throw new IllegalStateException(
      "cannot INSERT into a pinned (time-travel) graft-delta relation")
    val log = index.log
    val snap = log.update()
    val df = org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(session, query)
      .toDF(outputColumnNames.toSeq: _*)
    val ordered = df.select(snap.schema.fieldNames.map(col).toSeq: _*)
    GraftDeltaInserts.commitInsert(session, log, ordered,
      overwrite = mode == SaveMode.Overwrite,
      staticPartitions = staticPartitions,
      dynamicMode = session.conf
        .get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        .equalsIgnoreCase("dynamic"))
    Seq.empty
  }
}
