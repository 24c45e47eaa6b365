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
      if (c.staticPartitions.nonEmpty) throw new IllegalArgumentException(
        "graft-delta: static partition spec in INSERT is not supported; " +
        "include the partition columns in the inserted data instead")
      GraftInsertCommand(c.fileIndex.get.asInstanceOf[GraftFileIndex],
        c.query, c.mode, c.outputColumnNames)
  }
}

/** Transactional replacement for `InsertIntoHadoopFsRelationCommand` over a
  * graft-delta table: stage parquet + commit Adds via [[GraftWriter]]. The
  * incoming `query` is already column-aligned and cast by Spark's V1 insert
  * preprocessing; `outputColumnNames` names its output positionally. */
final case class GraftInsertCommand(
    index: GraftFileIndex, query: LogicalPlan, mode: SaveMode,
    outputColumnNames: Seq[String]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    if (!index.live) throw new IllegalStateException(
      "cannot INSERT into a pinned (time-travel) graft-delta relation")
    val snap = index.snapshot
    val df = org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(session, query)
      .toDF(outputColumnNames.toSeq: _*)
    val ordered = df.select(snap.schema.fieldNames.map(col).toSeq: _*)
    GraftWriter.write(ordered, index.log.tablePath.toString, mode,
      snap.partitionColumns)
    index.log.update()
    Seq.empty
  }
}
