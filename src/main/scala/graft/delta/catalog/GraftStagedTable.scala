package graft.delta.catalog

import java.util

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

import graft.delta.GraftWriter

/** Staged table for `REPLACE TABLE` / `CREATE OR REPLACE TABLE [AS SELECT]`
  * on a graft-delta location.
  *
  * The replacement is ONE transactional overwrite commit
  * (`GraftWriter.write(Overwrite, overwriteSchema = true)`): new schema and
  * partitioning govern exactly the new files, every old file is removed in
  * the same commit, and time travel to the pre-replace version keeps
  * working — the Delta-native realization of "atomic replace", stronger
  * than the drop-then-recreate a non-staging catalog would do. A REPLACE
  * without `AS SELECT` commits the same shape with an empty file set.
  * `commitStagedChanges` then syncs the metastore entry (registered by
  * [[GraftCatalog.stageCreateOrReplace]] before the write, so a crash
  * leaves a valid entry over the still-readable previous version). */
final class GraftStagedTable(
    location: String,
    tableSchema: StructType,
    partitionColumns: Seq[String],
    configuration: Map[String, String],
    onCommit: () => Unit) extends StagedTable with SupportsWrite {

  @volatile private var wrote = false

  override def name(): String = s"graft-delta.`$location` (staged)"
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] =
    partitionColumns.map(Expressions.identity).toArray
  override def properties(): util.Map[String, String] = util.Map.of()
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  private def replaceWith(data: DataFrame): Unit = {
    GraftWriter.write(data.toDF(tableSchema.fieldNames.toSeq: _*), location,
      SaveMode.Overwrite, partitionBy = partitionColumns,
      overwriteSchema = true,
      // REPLACE replaces the declared TBLPROPERTIES along with the schema —
      // previously they were validated and then silently dropped
      configuration = Some(configuration))
    wrote = true
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // replace IS a truncate
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              replaceWith(data)
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    // REPLACE without AS SELECT: same commit shape, zero rows
    if (!wrote) {
      val spark = org.apache.spark.sql.SparkSession.active
      replaceWith(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tableSchema))
    }
    onCommit()
  }

  override def abortStagedChanges(): Unit = ()
}

/** Staged wrapper for the CREATE cases (no replacement semantics): the
  * table was fully created up front (log v0 + metastore entry); the staged
  * write is a plain transactional append into it and commit is a no-op —
  * abort drops what was just created. */
final class GraftStagedCreate(
    created: GraftTable,
    onAbort: () => Unit) extends StagedTable with SupportsWrite {
  override def name(): String = created.name()
  override def schema(): StructType = created.schema()
  override def partitioning(): Array[Transform] = created.partitioning()
  override def properties(): util.Map[String, String] = created.properties()
  override def capabilities(): util.Set[TableCapability] = created.capabilities()
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    created.newWriteBuilder(info)
  override def commitStagedChanges(): Unit = ()
  override def abortStagedChanges(): Unit = onAbort()
}

/** Non-graft providers: emulate the delegate's non-atomic semantics
  * (create eagerly, write into the created table, drop on abort). */
final class BestEffortStagedTable(
    table: Table,
    onAbort: () => Unit) extends StagedTable with SupportsWrite {
  override def name(): String = table.name()
  override def schema(): StructType = table.schema()
  override def partitioning(): Array[Transform] = table.partitioning()
  override def properties(): util.Map[String, String] = table.properties()
  override def capabilities(): util.Set[TableCapability] = table.capabilities()
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = table match {
    case w: SupportsWrite => w.newWriteBuilder(info)
    case _ => throw new UnsupportedOperationException(
      s"table ${table.name()} does not support writes")
  }
  override def commitStagedChanges(): Unit = ()
  override def abortStagedChanges(): Unit = onAbort()
}
