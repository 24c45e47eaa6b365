package graft.delta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, Metadata, MetadataBuilder, StructField, StructType}

/** Delta column mapping, READ side, `delta.columnMapping.mode` `name`
  * and `id`.
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
  * `mode = id` rides the same physical-schema path with ONE addition: the
  * read schema carries each field's `delta.columnMapping.id` as Spark's
  * `parquet.field.id` metadata and the scan enables Spark's native
  * field-id matching, so columns resolve by the AUTHORITATIVE parquet
  * footer ids regardless of at-rest column names ([[readSchema]]). Writes
  * attach the same ids so staged files are footer-id-correct
  * ([[toPhysical]]; Spark writes `parquet.field.id` metadata into footers
  * by default).
  *
  * Writes on mapped tables all ride the same physical staging: appends and
  * overwrites ([[GraftWriter]], SQL INSERT via [[GraftDeltaInserts]]),
  * copy-on-write AND merge-on-read (DV) DELETE/UPDATE plus MERGE ([[Dml]]/
  * [[MergeBuilder]] — logical predicates/clauses against the aliased scan,
  * rewrites staged back via [[toPhysical]]), OPTIMIZE/Z-ORDER
  * ([[Optimize]]), and mergeSchema evolution (new columns allocate
  * `col-<uuid>` physical names + ids, [[ColumnMappingDdl.allocateField]]).
  * [[ColumnMappingDdl]] is the authoring side: upgrade to mode=name,
  * RENAME/DROP COLUMN as metadata-only commits. Out of scope, refused
  * loudly: wholesale schema replacement (`overwriteSchema`) and
  * mapping-mode values other than none/name/id.
  */
object ColumnMapping {

  val ModeKey = "delta.columnMapping.mode"
  val PhysicalNameKey = "delta.columnMapping.physicalName"
  val FieldIdKey = "delta.columnMapping.id"

  /** Spark's parquet field-id metadata key (SQLConf-gated matching). */
  val ParquetFieldId = "parquet.field.id"

  def mode(config: Map[String, String]): String =
    config.getOrElse(ModeKey, "none")

  def mode(snap: Snapshot): String =
    mode(snap.metadata.map(_.configuration).getOrElse(Map.empty))

  /** Mapped = the at-rest names differ from logical; both supported modes
    * scan through the physical-schema path. */
  def isMapped(snap: Snapshot): Boolean =
    mode(snap) == "name" || mode(snap) == "id"

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
    * level, identical types/nullability/metadata. With `attachIds` each
    * field's `delta.columnMapping.id` is restated as `parquet.field.id`
    * so Spark's parquet reader/writer matches/stamps footer field ids —
    * ONLY for mode=id tables: name-mode files (e.g. converted in place)
    * may predate mapping and carry no footer ids at all. */
  def physicalSchema(logical: StructType, attachIds: Boolean = false): StructType =
    StructType(logical.fields.map { f =>
      f.copy(name = physicalFieldName(f),
        dataType = physicalType(f.dataType, attachIds),
        metadata = withFieldId(f.metadata, attachIds))
    })

  private def withFieldId(m: Metadata, attachIds: Boolean): Metadata =
    if (!attachIds || !m.contains(FieldIdKey)) m
    else new MetadataBuilder().withMetadata(m)
      .putLong(ParquetFieldId, m.getLong(FieldIdKey)).build()

  private def physicalType(dt: DataType, attachIds: Boolean = false): DataType = dt match {
    case s: StructType => physicalSchema(s, attachIds)
    case a: ArrayType => a.copy(elementType = physicalType(a.elementType, attachIds))
    case m: MapType => m.copy(keyType = physicalType(m.keyType, attachIds),
      valueType = physicalType(m.valueType, attachIds))
    case other => other
  }

  /** The scan-side read schema for a mapped snapshot, enabling Spark's
    * field-id matching for mode=id. SESSION-wide conf, deliberately:
    * ParquetFileFormat reads `spark.sql.parquet.fieldId.read.enabled`
    * from the SQLConf, not from per-relation options, so scoping it to
    * graft's scans alone would need internal-API surgery. The flip is
    * inert for schemas without `parquet.field.id` metadata (every
    * non-id-mapped read here); the one theoretical casualty — a user's
    * own parquet read whose supplied schema carries id metadata meant as
    * documentation only — trades against id-mapped tables simply not
    * resolving at all (r11 review: considered, kept, documented). The ONE
    * choke point every mapped read path goes through (GraftFileIndex,
    * the row-level feeds, the streaming source and tailer). */
  def readSchema(spark: SparkSession, snap: Snapshot): StructType = {
    val ids = mode(snap) == "id"
    if (ids) spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    physicalSchema(snap.schema, ids)
  }

  /** Rename a LOGICAL-named frame to the table's at-rest physical names
    * (every nesting level — nested renames ride a same-shape struct cast),
    * so a plain parquet write of the result lands protocol-correct files:
    * physical columns, physical partition dirs, physical footer-stats keys.
    * `logical` is the TABLE's schema (it carries the physicalName
    * metadata); `df`'s columns are matched to it by name. */
  /** `passthrough` columns (feed metadata like `_change_type`) keep their
    * names untouched — the protocol never maps them. */
  def toPhysical(df: org.apache.spark.sql.DataFrame,
                 logical: StructType,
                 attachIds: Boolean = false,
                 passthrough: Set[String] = Set.empty): org.apache.spark.sql.DataFrame = {
    val byName = logical.fields.map(f => f.name -> f).toMap
    df.select(df.schema.fieldNames.toSeq.map { n =>
      if (passthrough.contains(n)) df.col(s"`$n`")
      else {
        val f = byName.getOrElse(n, throw new IllegalArgumentException(
          s"column $n is not in the mapped table's schema"))
        val physDt = physicalType(f.dataType, attachIds)
        val c = df.col(s"`$n`")
        (if (physDt == f.dataType) c else c.cast(physDt))
          .as(physicalFieldName(f), withFieldId(f.metadata, attachIds))
      }
    }: _*)
  }
}
