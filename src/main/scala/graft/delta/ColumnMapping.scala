package graft.delta

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Delta column mapping, READ side, `delta.columnMapping.mode = name`.
  *
  * A column-mapped table stores data under stable PHYSICAL column names
  * (`col-<uuid>`, recorded per field as schema metadata
  * `delta.columnMapping.physicalName`) so logical renames and drops are
  * metadata-only. Everything at rest speaks physical: parquet columns at
  * every nesting level, `add.partitionValues` keys, and per-file stats
  * keys. A by-logical-name scan returns all nulls — which is why
  * [[ProtocolSupport]] refused these tables outright before this existed.
  *
  * The read path stays physical-consistent end to end with ONE conversion
  * point: [[GraftFileIndex]] exposes the physical schema (logical TYPES,
  * physical NAMES, recursively), so Catalyst-pushed filters, partition
  * pruning, and stats skipping all arrive in physical terms against
  * physical keys with no per-expression translation — and
  * [[DeltaTable.scanWithIndex]] aliases physical back to logical as the
  * scan's final projection (nested renames ride a same-shape struct cast,
  * which [[org.apache.spark.sql.catalyst.optimizer.SimplifyCasts]] erases
  * for primitives).
  *
  * Out of scope, each refused loudly: `mode = id` (parquet field-id
  * matching), writes of any kind (physical-name allocation), and row-level
  * feeds (CDF scans would need the same aliasing through the change-file
  * reader).
  */
object ColumnMapping {

  val ModeKey = "delta.columnMapping.mode"
  val PhysicalNameKey = "delta.columnMapping.physicalName"

  def mode(config: Map[String, String]): String =
    config.getOrElse(ModeKey, "none")

  def mode(snap: Snapshot): String =
    mode(snap.metadata.map(_.configuration).getOrElse(Map.empty))

  def isNameMapped(snap: Snapshot): Boolean = mode(snap) == "name"

  /** The field's at-rest name: its recorded physical name, or (unmapped
    * field in a mapped table — never produced by delta-spark, but tolerate)
    * its logical name. */
  def physicalFieldName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  /** Physical name of a top-level logical column (partition-column
    * resolution: `metaData.partitionColumns` holds LOGICAL names while
    * `add.partitionValues` is keyed physically). */
  def physicalName(logicalSchema: StructType, logicalCol: String): String =
    logicalSchema.fields.find(_.name == logicalCol)
      .map(physicalFieldName).getOrElse(logicalCol)

  /** Logical schema → at-rest schema: physical names at every nesting
    * level, identical types/nullability/metadata. */
  def physicalSchema(logical: StructType): StructType =
    StructType(logical.fields.map(f =>
      f.copy(name = physicalFieldName(f), dataType = physicalType(f.dataType))))

  private def physicalType(dt: DataType): DataType = dt match {
    case s: StructType => physicalSchema(s)
    case a: ArrayType => a.copy(elementType = physicalType(a.elementType))
    case m: MapType => m.copy(keyType = physicalType(m.keyType),
      valueType = physicalType(m.valueType))
    case other => other
  }

  /** Rename a LOGICAL-named frame to the table's at-rest physical names
    * (every nesting level — nested renames ride a same-shape struct cast),
    * so a plain parquet write of the result lands protocol-correct files:
    * physical columns, physical partition dirs, physical footer-stats keys.
    * `logical` is the TABLE's schema (it carries the physicalName
    * metadata); `df`'s columns are matched to it by name. */
  def toPhysical(df: org.apache.spark.sql.DataFrame,
                 logical: StructType): org.apache.spark.sql.DataFrame = {
    val byName = logical.fields.map(f => f.name -> f).toMap
    df.select(df.schema.fieldNames.toSeq.map { n =>
      val f = byName.getOrElse(n, throw new IllegalArgumentException(
        s"column $n is not in the mapped table's schema"))
      val physDt = physicalType(f.dataType)
      val c = df.col(s"`$n`")
      (if (physDt == f.dataType) c else c.cast(physDt))
        .as(physicalFieldName(f))
    }: _*)
  }
}
