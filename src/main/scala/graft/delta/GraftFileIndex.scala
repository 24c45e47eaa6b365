package graft.delta

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, LessThan, LessThanOrEqual, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-integrated file index over a Delta [[Snapshot]] — the idiomatic
  * Spark realization of the reference's pre-scan pruning (SURVEY §4):
  * instead of handing Spark a pre-filtered path list, the snapshot's file
  * inventory is exposed through `FileIndex.listFiles`, so **Catalyst-pushed
  * filters prune files at plan time**:
  *
  *  - `partitionFilters` are evaluated against each Add's typed
  *    `partitionValues` (the reference's partition pruning,
  *    `rust/src/delta.rs:733-766`) — a plain `df.filter($"year" === 2021)`
  *    never lists the other years' files;
  *  - `dataFilters` of simple comparison shape are translated to
  *    [[StatsPredicate]]s and checked against per-file min/max/nullCount
  *    (the reference's per-file statistics role,
  *    `rust/src/delta_datafusion.rs:60-97`), skip-on-doubt.
  *
  * Parquet row-group skipping continues below the file level for free. At
  * 100 TB this is the difference between listing 10⁶ files and listing the
  * handful a pruned query touches.
  */
final class GraftFileIndex(
    private[delta] val spark: SparkSession,
    private[delta] val log: DeltaLog,
    private[delta] val snapshot: Snapshot,
    preSelected: Option[Seq[AddAction]] = None,
    private[delta] val live: Boolean = false) extends FileIndex {

  // every data scan funnels through this index — the protocol capability
  // fence lives here so unsupported tables refuse loudly instead of
  // mis-reading (ProtocolSupport scaladoc has the failure modes)
  ProtocolSupport.assertReadable(snapshot)
  private var protocolCheckedVersion: Long = snapshot.version

  // Column-mapped tables speak PHYSICAL names at rest (parquet columns,
  // partitionValues keys, stats keys) — the index exposes the physical
  // schema so every pushed filter, partition lookup, and stats key below
  // is physical-consistent with no per-expression translation; the scan's
  // final projection aliases back to logical (see ColumnMapping scaladoc).
  // mode=id additionally matches parquet columns by footer field id.
  private val tableSchema: StructType =
    if (ColumnMapping.isMapped(snapshot))
      ColumnMapping.readSchema(spark, snapshot)
    else snapshot.schema
  private val partCols: Seq[String] =
    if (ColumnMapping.isMapped(snapshot))
      snapshot.partitionColumns.map(c =>
        ColumnMapping.physicalName(snapshot.schema, c))
    else snapshot.partitionColumns

  override val partitionSchema: StructType =
    StructType(partCols.flatMap(c => tableSchema.fields.find(_.name == c)))

  def dataSchema: StructType =
    StructType(tableSchema.fields.filterNot(f => partCols.contains(f.name)))

  /** `live` indices (the catalog/format read path) re-resolve the latest
    * snapshot per listing, so a cached `LogicalRelation` still reads current
    * data after commits (read-your-writes through a catalog table name).
    * The incremental `update()` costs one log-dir listing when nothing
    * changed. Pinned indices (explicit DeltaTable handles, time travel,
    * DML rewrites) keep their construction-time file set. The schema is
    * always construction-time — a concurrent metadata change requires
    * re-resolving the relation, as with any Spark catalog table. */
  private def baseFiles: Seq[AddAction] =
    preSelected.getOrElse {
      if (live) {
        val s = log.update()
        if (s.version != protocolCheckedVersion) {
          ProtocolSupport.assertReadable(s)
          protocolCheckedVersion = s.version
        }
        s.files
      } else snapshot.files
    }

  /** Files this scan covers — the stats substrate for plan-time rewrites
    * (see [[StatsOnlyAggregates]]). */
  def statsFiles: Seq[AddAction] = baseFiles

  override def rootPaths: Seq[Path] = Seq(log.tablePath)

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = baseFiles.map(_.size).sum

  override def inputFiles: Array[String] =
    baseFiles.map(a => new Path(log.tablePath, a.path).toString).toArray

  /** Observability hook for tests/metrics: files surviving the last prune. */
  @volatile var lastListedFileCount: Int = -1

  // ---- partition-value typing ------------------------------------------

  /** Hive string → Catalyst value for the partition InternalRow. Unknown
    * types and unparsable values THROW (r11 review): a silent null here is
    * not conservative — it surfaces as NULL partition values in result
    * rows, and a pushed `part = x` filter evaluates null→false and prunes
    * EVERY file (a wrong empty answer, not a kept file). */
  private def catalystPartitionValue(s: String, dt: DataType): Any =
    if (s == null) null
    else try dt match {
      case StringType  => UTF8String.fromString(s)
      case IntegerType => s.toInt
      case LongType    => s.toLong
      case ShortType   => s.toShort
      case ByteType    => s.toByte
      case BooleanType => s.toBoolean
      case DoubleType  => s.toDouble
      case FloatType   => s.toFloat
      case DateType    => java.time.LocalDate.parse(s).toEpochDay.toInt
      // the spec serializes timestamp partitions as `yyyy-MM-dd HH:mm:ss[.S…]`
      // (tolerate the ISO 'T'); µs since epoch, parsed in UTC explicitly —
      // the same contract Checkpoints.parsedPartitionType applies
      case TimestampType | TimestampNTZType =>
        java.time.LocalDateTime.parse(s.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
          java.time.LocalDateTime.parse(s.replace(' ', 'T')).getNano / 1000L
      case _: DecimalType => org.apache.spark.sql.types.Decimal(BigDecimal(s))
      case other => throw new IllegalArgumentException(
        s"partition type ${other.simpleString} has no hive-string decoding")
    } catch {
      case e: IllegalArgumentException => throw e
      case e: Exception => throw new IllegalArgumentException(
        s"cannot parse partition value '$s' as ${dt.simpleString}", e)
    }

  private def partitionRow(a: AddAction): InternalRow =
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map(f =>
      catalystPartitionValue(a.partitionValues.get(f.name).orNull, f.dataType)))

  // ---- dataFilters → stats predicates ----------------------------------

  private def literalValue(l: Literal): Option[Any] = l.value match {
    case null => None
    case u: UTF8String => Some(u.toString)
    case n: java.lang.Number => Some(n)
    case other => Some(other)
  }

  private def toStats(e: Expression): Option[StatsPredicate] = {
    def v(l: Literal): Option[Any] = literalValue(l).map {
      case n: java.lang.Long => n.longValue
      case n: java.lang.Integer => n.intValue
      case n: java.lang.Double => n.doubleValue
      case n: java.lang.Float => n.floatValue.toDouble
      case n: java.lang.Short => n.intValue
      case n: java.lang.Byte => n.intValue
      case other => other
    }
    e match {
      case GreaterThan(a: AttributeReference, l: Literal) => v(l).map(StatsPredicate.Gt(a.name, _))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => v(l).map(StatsPredicate.Ge(a.name, _))
      case LessThan(a: AttributeReference, l: Literal) => v(l).map(StatsPredicate.Lt(a.name, _))
      case LessThanOrEqual(a: AttributeReference, l: Literal) => v(l).map(StatsPredicate.Le(a.name, _))
      case EqualTo(a: AttributeReference, l: Literal) => v(l).map(StatsPredicate.EqTo(a.name, _))
      // mirrored literal-first forms
      case GreaterThan(l: Literal, a: AttributeReference) => v(l).map(StatsPredicate.Lt(a.name, _))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => v(l).map(StatsPredicate.Le(a.name, _))
      case LessThan(l: Literal, a: AttributeReference) => v(l).map(StatsPredicate.Gt(a.name, _))
      case LessThanOrEqual(l: Literal, a: AttributeReference) => v(l).map(StatsPredicate.Ge(a.name, _))
      case IsNotNull(a: AttributeReference) => Some(StatsPredicate.NotNull(a.name))
      // IN-list point lookups over integral columns — the index-probe shape
      // (e.g. a band-hash or id set). Against a value-clustered layout this
      // prunes to O(|list|) files regardless of table size (r15). Catalyst
      // rewrites long lists to InSet past inSetConversionThreshold, so both
      // forms must translate.
      case In(a: AttributeReference, list)
          if integralLong(a.dataType) && list.nonEmpty &&
            list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.map { case Literal(v, _) => v }
        if (vs.contains(null)) None // null never matches, but keep it simple
        else Some(StatsPredicate.inLongSet(a.name,
          vs.map(v => v.asInstanceOf[Number].longValue).toArray))
      case InSet(a: AttributeReference, hset)
          if integralLong(a.dataType) && hset.nonEmpty && !hset.contains(null) =>
        Some(StatsPredicate.inLongSet(a.name,
          hset.iterator.map(_.asInstanceOf[Number].longValue).toArray))
      case _ => None // unsupported shape: no pruning from this conjunct
    }
  }

  private def integralLong(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  // ---- the prune --------------------------------------------------------

  /** Steps 1-2 of the prune without the directory grouping — also the
    * plan-time entry for [[PruneGraftScans]], which re-scopes the index so
    * `sizeInBytes` (and thus broadcast decisions) reflect the pruned set. */
  private[delta] def pruneFiles(partitionFilters: Seq[Expression],
                                dataFilters: Seq[Expression]): Seq[AddAction] =
    pruneFiles(partitionFilters, dataFilters, baseFiles)

  /** As above over a CALLER-materialized base — plan-time rewrites
    * (PruneGraftScans) pass the statsFiles they already read, so one
    * rescope performs ONE live-log listing and its shrink test compares
    * a single consistent version (r11 review: two separate calls doubled
    * the listing and could straddle a concurrent commit). */
  private[delta] def pruneFiles(partitionFilters: Seq[Expression],
                                dataFilters: Seq[Expression],
                                base: Seq[AddAction]): Seq[AddAction] = {
    // 1. partition pruning, mirroring PartitioningAwareFileIndex's binding
    val afterPartition =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) base
      else {
        val predicate = partitionFilters.reduce(And)
        val bound = Predicate.createInterpreted(predicate.transform {
          case a: AttributeReference =>
            val idx = partitionSchema.fieldIndex(a.name)
            BoundReference(idx, partitionSchema(idx).dataType, nullable = true)
        })
        base.filter(a => bound.eval(partitionRow(a)))
      }

    // 2. stats-based skipping from pushed data filters
    val statsPreds = dataFilters.flatMap(toStats)
    StatsPredicate.prune(afterPartition, statsPreds)
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val selected = pruneFiles(partitionFilters, dataFilters)
    lastListedFileCount = selected.size

    // 3. group by partition tuple → PartitionDirectory
    def status(a: AddAction): FileStatus =
      new FileStatus(a.size, false, 1, 128L * 1024 * 1024, a.modificationTime,
        new Path(log.tablePath, a.path))
    if (partitionSchema.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty, selected.map(status).toArray))
    else
      selected.groupBy(a => partCols.map(c => a.partitionValues.get(c).orNull))
        .toSeq.sortBy(_._1.mkString("/"))
        .map { case (_, files) =>
          PartitionDirectory(partitionRow(files.head), files.map(status).toArray)
        }
  }
}
