package graft.delta

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Relation-level statistics for the cost-based optimizer.
  *
  * A bare `HadoopFsRelation` advertises only `sizeInBytes`, which drives the
  * broadcast threshold; CBO join reordering and plan-stats estimation also
  * want an exact `rowCount`, which the Delta log already knows from per-file
  * `numRecords` — no ANALYZE TABLE scan needed (the reference folds the same
  * per-file stats in `statistics()`, `rust/src/delta_datafusion.rs:117-209`).
  * The numbers ride on a synthetic `CatalogTable` because
  * `LogicalRelation.computeStats` reads plan-level row counts only from
  * catalog statistics.
  *
  * Row counts are folded only when `spark.sql.cbo.enabled` or
  * `spark.sql.planStats.enabled` is set: the fold parses O(#files) stats
  * JSON on the driver, so a session that would ignore the result never pays
  * for it.
  */
object RelationStats {

  private def statsEnabled(conf: SQLConf): Boolean =
    conf.cboEnabled || conf.planStatsEnabled

  /** Full-snapshot catalog shell for [[DeltaTable.toDF]] scans. */
  def catalogTable(log: DeltaLog, snapshot: Snapshot,
                   relationSchema: StructType): CatalogTable = {
    val rowCount =
      if (statsEnabled(log.spark.sessionState.conf)) snapshot.statistics.numRecords
      else None
    CatalogTable(
      identifier = TableIdentifier(log.tablePath.getName),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(locationUri = Some(log.tablePath.toUri)),
      schema = relationSchema,
      provider = Some("graft-delta"),
      partitionColumnNames = snapshot.partitionColumns,
      stats = Some(CatalogStatistics(
        sizeInBytes = BigInt(snapshot.files.map(_.size).sum),
        rowCount = rowCount.map(BigInt(_)))))
  }

  /** Statistics of a pruned file set, for [[PruneGraftScans]] re-scoping —
    * keeps catalog stats in step with the shrunk scan so CBO sees the
    * pruned row count, not the whole table's. */
  def pruned(files: Seq[AddAction], conf: SQLConf): CatalogStatistics = {
    // ONE numRecords definition: TableStatistics.of carries the
    // completeness check and DV-cardinality subtraction (bug-fixed in r9)
    // — re-deriving it here would drift (r11 review)
    val rowCount =
      if (statsEnabled(conf)) TableStatistics.of(files).numRecords.map(BigInt(_))
      else None
    CatalogStatistics(BigInt(files.map(_.size).sum), rowCount)
  }
}
