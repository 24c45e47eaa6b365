package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.connector.catalog.{Table, V1Table}

/** V1 catalog-table shims for [[graft.delta.catalog.GraftCatalog]].
  * `V1Table` is `private[sql]`, so the synthesis lives in the bridge
  * namespace (see [[ColumnBridge]]'s note); returning V1 metadata from the
  * catalog is what keeps reads and inserts on the engine's optimized V1
  * relation path instead of demanding a parallel DSv2 scan implementation. */
object CatalogBridge {

  /** The wrapped v1 metadata of a catalog table, if it is one. */
  def asV1CatalogTable(table: Table): Option[CatalogTable] = table match {
    case v1: V1Table => Some(v1.v1Table)
    case _ => None
  }

  /** A `DataSourceV2Relation.timeTravelSpec` as graft-delta reader options
    * (`TimeTravelSpec` is `private[sql]`). Timestamps arrive as micros. */
  def timeTravelOptions(
      spec: org.apache.spark.sql.catalyst.analysis.TimeTravelSpec): Map[String, String] =
    spec match {
      case org.apache.spark.sql.catalyst.analysis.AsOfVersion(v) =>
        Map("versionAsOf" -> v)
      case org.apache.spark.sql.catalyst.analysis.AsOfTimestamp(micros) =>
        Map("timestampAsOf" -> java.time.Instant.ofEpochSecond(
          micros / 1000000L, (micros % 1000000L) * 1000L).toString)
    }

  /** Single-column identity-transform names; None for any other transform
    * shape (bucket/years/…). `IdentityTransform`/`FieldReference` extractors
    * are `private[sql]`. */
  def identityPartitionNames(
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform])
      : Seq[Either[String, String]] =
    partitions.toSeq.map {
      case org.apache.spark.sql.connector.expressions.IdentityTransform(
            org.apache.spark.sql.connector.expressions.FieldReference(Seq(name))) =>
        Right(name.toString)
      case other => Left(other.toString)
    }

  /** `CLUSTER BY` columns of a v2 transform array (dotted nested paths);
    * empty when the DDL declared none. */
  def clusterByColumns(
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform])
      : Seq[String] =
    partitions.toSeq.flatMap {
      case org.apache.spark.sql.connector.expressions.ClusterByTransform(refs) =>
        refs.map(_.fieldNames().mkString("."))
      case _ => Nil
    }

  def withoutClusterBy(
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform])
      : Array[org.apache.spark.sql.connector.expressions.Transform] =
    partitions.filter {
      case org.apache.spark.sql.connector.expressions.ClusterByTransform(_) => false
      case _ => true
    }

  /** v2 Column[] ⇄ StructType (`CatalogV2Util` is `private[sql]`). */
  def v2ColumnsToStructType(
      columns: Array[org.apache.spark.sql.connector.catalog.Column]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util.v2ColumnsToStructType(columns)

  def structTypeToV2Columns(
      schema: org.apache.spark.sql.types.StructType): Array[org.apache.spark.sql.connector.catalog.Column] =
    org.apache.spark.sql.connector.catalog.CatalogV2Util.structTypeToV2Columns(schema)
}

/** [[graft.delta.catalog.GraftTable]] + the `V2TableWithV1Fallback` hook
  * (`private[sql]`, hence this namespace): `spark.readStream.table("name")`
  * resolves the v1 metadata to a `StreamingRelation` over the graft-delta
  * V1 streaming source — catalog names work for streams, not just paths. */
final class StreamableGraftTable(
    location: String,
    tableSchema: org.apache.spark.sql.types.StructType,
    partitionColumns: Seq[String],
    options: Map[String, String])
  extends graft.delta.catalog.GraftTable(location, tableSchema, partitionColumns, options)
  with org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback {

  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable =
    org.apache.spark.sql.catalyst.catalog.CatalogTable(
      identifier = org.apache.spark.sql.catalyst.TableIdentifier(
        location, Some("graft-delta")),
      tableType = org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL,
      storage = org.apache.spark.sql.catalyst.catalog.CatalogStorageFormat.empty.copy(
        // raw-path → URI via Hadoop Path (a bare `new URI` throws on
        // URI-illegal but filesystem-legal characters like spaces)
        locationUri = Some(new org.apache.hadoop.fs.Path(location).toUri),
        properties = options),
      schema = tableSchema,
      provider = Some("graft-delta"),
      partitionColumnNames = partitionColumns)
}
