package graft.delta

import org.apache.spark.sql.types._

/** Delta `schemaString` ⇄ Spark `StructType`.
  *
  * The Delta schema JSON (`rust/src/schema.rs:135-161`: `struct`/`array`/
  * `map`/primitive, with `elementType`/`containsNull`/`keyType`/`valueType`/
  * `valueContainsNull`) is the same JSON dialect Spark's own
  * `DataType.fromJson`/`.json` speaks — both descend from the original Spark
  * SQL schema format — so the conversion delegates to Spark with validation.
  *
  * Divergences from the reference handled here:
  *  - `timestamp` maps to Spark's µs `TimestampType` per the Delta protocol;
  *    the reference's ns mapping is a known quirk (`rust/src/delta_arrow.rs:96-99`)
  *    we deliberately do NOT copy.
  *  - `map` is a real `MapType`; the reference degrades to an Arrow Dictionary
  *    (`rust/src/delta_arrow.rs:119-135`) because Arrow 4 lacked maps.
  */
object DeltaSchema {

  /** Parse a Delta schemaString into a Spark schema. */
  def fromJson(schemaString: String): StructType =
    DataType.fromJson(schemaString) match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"Delta schemaString must be a struct, got: ${other.simpleString}")
    }

  /** Serialize a Spark schema as a Delta schemaString. Spark's
    * `TimestampNTZType` serializes as the protocol's distinct
    * `timestamp_ntz` primitive (round 11 — previously normalized to
    * `timestamp`, value-preserving under the fixed UTC session zone but
    * lossy at rest: a foreign reader of a graft table born from NTZ data
    * saw a tz-aware column). Callers committing an NTZ-bearing schema owe
    * the `timestampNtz` reader+writer feature — [[ProtocolSupport
    * .configFences]] folds it from the schema argument. */
  def toJson(schema: StructType): String = {
    validate(schema)
    schema.json
  }

  /** Map NTZ → µs TimestampType at every nesting level — values identical
    * under the engine's fixed UTC session zone. COMPARISON-ONLY since
    * round 11: [[toJson]] persists NTZ faithfully, but schema-compat
    * checks (appends, INSERTs, declared-schema catalog binds) normalize
    * BOTH sides so legacy tables (metadata persisted through the old
    * NTZ→timestamp mapping) still accept the very same NTZ frame they
    * were created from (found by the round-8 6M-row scale probe —
    * tz-naive parquet reads as NTZ), and new NTZ-at-rest tables accept
    * tz-aware frames of identical UTC values. */
  def normalize(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(dataType = normalizeType(f.dataType))))

  private def normalizeType(dt: DataType): DataType = dt match {
    case TimestampNTZType => TimestampType
    case s: StructType => StructType(s.fields.map(f => f.copy(dataType = normalizeType(f.dataType))))
    case a: ArrayType => a.copy(elementType = normalizeType(a.elementType))
    case m: MapType => m.copy(keyType = normalizeType(m.keyType),
      valueType = normalizeType(m.valueType))
    case other => other
  }

  /** Backtick-quote a column name for Column-API resolution: an unquoted
    * `col("a.b")` resolves as struct-field access, mis-binding legal
    * dotted column names (r11 review). Embedded backticks double, per the
    * SQL identifier rules. */
  def quoted(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Shape-only view of a type: names + types at every nesting level,
    * nullability and field metadata erased. Parquet round-trips are
    * insensitive to both, so schema compatibility checks (exact-match
    * writes, mergeSchema conflict detection) compare THIS — StructField
    * equality would drag in nested nullability and e.g. a mapped table's
    * columnMapping annotations. */
  def structural(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f => StructField(f.name, structural(f.dataType))))
    case a: ArrayType => ArrayType(structural(a.elementType))
    case m: MapType => MapType(structural(m.keyType), structural(m.valueType))
    case other => other
  }

  /** `variant` (Spark 4's VariantType ⇄ the protocol's `variantType`
    * feature) rides Spark's own JSON name — the schemaString encodes it
    * as `"variant"` on both sides. */
  private val supportedPrimitives: Set[DataType] = Set(
    StringType, LongType, IntegerType, ShortType, ByteType, FloatType,
    DoubleType, BooleanType, BinaryType, DateType, TimestampType,
    TimestampNTZType, VariantType)

  /** Does the schema carry a timestamp-without-timezone column anywhere?
    * (Gates the `timestampNtz` reader+writer feature — the protocol added
    * the primitive behind a feature flag, so legacy readers refuse rather
    * than misread.) */
  def hasTimestampNtz(dt: DataType): Boolean = dt match {
    case TimestampNTZType => true
    case s: StructType => s.fields.exists(f => hasTimestampNtz(f.dataType))
    case a: ArrayType => hasTimestampNtz(a.elementType)
    case m: MapType => hasTimestampNtz(m.keyType) || hasTimestampNtz(m.valueType)
    case _ => false
  }

  /** Does the schema carry a variant column anywhere? (Gates the
    * `variantType` protocol feature at creation.) */
  def hasVariant(dt: DataType): Boolean = dt match {
    case VariantType => true
    case s: StructType => s.fields.exists(f => hasVariant(f.dataType))
    case a: ArrayType => hasVariant(a.elementType)
    case m: MapType => hasVariant(m.keyType) || hasVariant(m.valueType)
    case _ => false
  }

  /** Reject Spark types with no Delta-protocol encoding
    * (`rust/src/delta_arrow.rs:60-104` is the full primitive list). */
  def validate(dt: DataType): Unit = dt match {
    case s: StructType => s.fields.foreach(f => validate(f.dataType))
    case a: ArrayType => validate(a.elementType)
    case m: MapType => validate(m.keyType); validate(m.valueType)
    case _: DecimalType => ()
    case p if supportedPrimitives.contains(p) => ()
    case other => throw new IllegalArgumentException(
      s"type ${other.simpleString} has no Delta-protocol encoding")
  }
}
