package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deletion vectors: merge-on-read DELETE/UPDATE.
  *
  * Copy-on-write DML (see [[Dml]]) rewrites every file that contains one
  * matching row — at 100 TB a point delete can rewrite gigabytes to remove
  * kilobytes. With deletion vectors the matched row POSITIONS are written to
  * a small side file and the data file is re-committed unchanged with a
  * pointer to it; scans subtract the positions at read time. This is the
  * scale path for selective deletes; compaction ([[Optimize]]) later folds
  * the vectors back into rewritten files.
  *
  * The reference (delta-rs v0.4.1) predates deletion vectors entirely; the
  * protocol shape here is a graft extension carried in the Add action's
  * `tags` field (`rust/src/action.rs:183-185`, a free-form map that
  * checkpoint round-trips preserve):
  *
  *  - `tags["graft.dv.path"]`  — table-relative path of a parquet DIRECTORY
  *    holding (path: string, pos: long) rows: `path` is the data file's
  *    table-relative path, `pos` the 0-based row index within that file;
  *  - `tags["graft.dv.cardinality"]` — how many of the directory's rows
  *    target THIS file (so logical row counts need no DV read).
  *
  * DV directories live under `_graft_dv/` — hidden from vacuum by the
  * underscore rule. A file's DV always carries the COMPLETE deleted-position
  * set for that file (re-deletes union the old positions in), so a scan
  * needs only the newest Add's pointer. Foreign Delta readers do not know
  * this extension and would see deleted rows; tables stay interop-readable
  * the moment OPTIMIZE purges the vectors.
  *
  * Read integration is one plan rewrite ([[ApplyDeletionVectors]]): any
  * `LogicalRelation` over a [[GraftFileIndex]] whose files carry DVs gains a
  * left-anti join against the DV rows on
  * `(_metadata.file_path suffix, _metadata.row_index)`. Filters still reach
  * the parquet scan (the rewrite runs at resolution time, before optimizer
  * pushdown), and file-level pruning is untouched — per-file min/max remain
  * valid BOUNDS when rows are deleted, so stats skipping stays sound, while
  * exact stats answers are fenced off in [[TableStatistics]].
  */
object DeletionVectors {

  val PathTag = "graft.dv.path"
  val CardTag = "graft.dv.cardinality"
  val Dir = "_graft_dv"

  /** Columns appended by [[scanWithPos]]. */
  val PathCol = "__graft_dv_file"
  val PosCol = "__graft_dv_pos"

  /** Marks a LogicalRelation whose DV filtering is already applied (or
    * deliberately bypassed), so [[ApplyDeletionVectors]] leaves it alone. */
  private[delta] val AppliedTag = TreeNodeTag[Boolean]("graft.dv.applied")

  val dvSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  def dvPath(a: AddAction): Option[String] = a.tags.flatMap(_.get(PathTag))

  /** Deleted-position count for logical row accounting. Graft-tag first:
    * when graft DML supersedes a standard descriptor it unions the old
    * positions into its own DV and clears the descriptor, so at most one
    * source is authoritative per Add. */
  def cardinality(a: AddAction): Long =
    a.tags.flatMap(_.get(CardTag)).map(_.toLong)
      .orElse(StandardDv.descriptor(a).map(_.cardinality))
      .getOrElse(0L)

  /** True when the Add carries deleted positions in EITHER format — the
    * graft tag extension or the protocol's `add.deletionVector`. */
  def hasDv(a: AddAction): Boolean =
    dvPath(a).isDefined || a.deletionVector.isDefined
  def anyDv(files: Seq[AddAction]): Boolean = files.exists(hasDv)

  /** Exact LOGICAL row count of `files` from footer stats (numRecords
    * minus DV'd positions), or None when any file lacks stats — the
    * scan-free "before" count DML metrics and MERGE's multi-match
    * arithmetic both rest on. */
  def logicalRowCount(files: Seq[AddAction]): Option[Long] = {
    val counts = files.map(a => a.stats.flatMap(ActionCodec.statsFromJson)
      .map(_.numRecords - cardinality(a)))
    if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
  }

  /** `<table-dir-abs-path>/` — the prefix located inside
    * `_metadata.file_path` to cut out the table-relative file path. RAW
    * (percent-encoded) URI path, because `_metadata.file_path` is the
    * percent-encoded `Path.toUri.toString`: a decoded prefix never matches
    * inside the encoded string once the table path carries a space or
    * non-ASCII char, and `substring_index` would then yield the FULL URI —
    * so the DV anti-join subtracts nothing and deleted rows silently
    * resurface. The encoded suffix then percent-DECODES ([[relPathCol]])
    * so every downstream comparison — DV parquet keys, action paths,
    * vacuum/rewrite bookkeeping — lives in decoded action-path space. */
  private[delta] def tableDirPrefix(log: DeltaLog): String =
    log.tablePath.toUri.getRawPath.stripSuffix("/") + "/"

  /** The table-relative DECODED path of the scanned file — the one
    * expression every `_metadata.file_path` extraction must use. */
  private[delta] def relPathCol(log: DeltaLog,
                                filePath: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    relPathFromPrefix(tableDirPrefix(log), filePath)

  /** Seam of [[relPathCol]]: for a table at a bucket/volume ROOT the raw
    * path degenerates to "/" — `substring_index(p, "/", -1)` would then
    * cut at the LAST slash and return only the file NAME, so partitioned
    * root tables matched no add path and DV subtraction / DML provenance
    * silently missed everything (r11 review). Strip `scheme://authority/`
    * instead: the remaining path IS table-relative there. */
  private[delta] def relPathFromPrefix(
      prefix: String,
      filePath: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.UriPathDecode(
      if (prefix == "/")
        regexp_replace(filePath, "^[a-zA-Z][a-zA-Z0-9+.\\-]*:/{0,2}[^/]*/", "")
      else substring_index(filePath, prefix, -1))

  /** The protocol bump a configuration demands, or None when the current
    * protocol already satisfies it: enabling deletion vectors must fence
    * foreign readers (they don't know the graft tag extension and would
    * silently resurrect deleted rows), so minReaderVersion rises to 3 —
    * the table-features floor spec-compliant readers refuse without an
    * advertised feature list. EVERY path that can set table properties
    * (DeltaTable.setProperties, catalog CREATE, catalog ALTER) must apply
    * this. */
  def protocolFence(config: Map[String, String],
                    minReader: Int, minWriter: Int,
                    readerFeatures: Option[Set[String]] = None,
                    writerFeatures: Option[Set[String]] = None): Option[ProtocolAction] =
    if (!TableConfig.deletionVectorsEnabled(config)) None
    else if (readerFeatures.isDefined || writerFeatures.isDefined || minWriter >= 7)
      // Table-features protocol: declare the STANDARD `deletionVectors`
      // feature on BOTH lists, which also flips DML to protocol
      // descriptors (Dml.commitDvReAdds keys on the writer feature). The
      // old no-op here left e.g. a (3,7,{timestampNtz}) table unfenced:
      // a spec-compliant foreign reader supported every advertised
      // feature, ignored graft's tag extension, and silently resurrected
      // every deleted row (r11 review).
      ProtocolSupport.readerWriterFeatureFence(Snapshot(
        minReaderVersion = minReader, minWriterVersion = minWriter,
        readerFeatures = readerFeatures, writerFeatures = writerFeatures),
        "deletionVectors")
    else if (minReader < 3)
      // legacy protocol: graft's reader-3-no-list bump — the in-engine
      // shape foreign readers refuse outright (reader 3 demands a list)
      Some(ProtocolAction(3, math.max(minWriter, 2), readerFeatures, writerFeatures))
    else None

  /** Tombstones for every DV directory that the `replaced` files pointed at
    * and no OTHER live file still references. Emitted by the commits that
    * supersede or fold away DV pointers (DV re-deletes, OPTIMIZE, CoW
    * rewrites), so [[DeltaTable.vacuum]] can reclaim the directories after
    * retention — without these, recurring DV DML grows `_graft_dv/`
    * unboundedly (the underscore rule hides it from normal vacuum listing).
    * `dataChange=false`: the row-level change is carried by the file-level
    * actions of the same commit; the dir tombstone is housekeeping and must
    * commute like compaction does. */
  def supersededDirTombstones(snap: Snapshot, replaced: Seq[AddAction],
                              now: Long): Seq[RemoveAction] = {
    def dvStorage(a: AddAction): Seq[String] =
      dvPath(a).toSeq ++ stdDvRel(a).toSeq
    val old = replaced.flatMap(dvStorage).toSet
    if (old.isEmpty) return Nil
    val replacedPaths = replaced.map(_.path).toSet
    val stillReferenced = snap.files.iterator
      .filterNot(a => replacedPaths.contains(a.path))
      .flatMap(dvStorage).toSet
    (old -- stillReferenced).toSeq.sorted.map(p => RemoveAction(
      path = p, deletionTimestamp = now, dataChange = false,
      extendedFileMetadata = Some(false)))
  }

  /** Table-relative path of the STANDARD packed DV file an Add references
    * ('u' storage only — inline carries no file, 'p' is foreign-absolute
    * and never graft-reclaimed). 'u' names are table-relative by
    * construction, so resolving against the root yields the relative path
    * without knowing the table location. */
  private[delta] def stdDvRel(a: AddAction): Option[String] =
    StandardDv.descriptor(a).filter(_.storageType == "u").map(
      _.absolutePath(new Path("/")).toUri.getPath.stripPrefix("/"))

  /** All DV rows referenced by `files` — graft-tag parquet directories and
    * standard `add.deletionVector` descriptors decoded on executors —
    * restricted to those files' paths (a DV directory may be shared by many
    * files and may carry superseded entries for files whose newer Add
    * points elsewhere). */
  def dvDf(spark: SparkSession, log: DeltaLog,
           files: Seq[AddAction]): Option[DataFrame] = {
    val withGraft = files.filter(a => dvPath(a).isDefined)
    val graft =
      if (withGraft.isEmpty) None
      else {
        val dirs = withGraft.flatMap(dvPath).distinct
          .map(rel => new Path(log.tablePath, rel).toString)
        // Restrict to these files' paths via a broadcast semi-join, NOT
        // `isin(paths)`: a literal In over 10⁵-10⁶ DV-carrying paths is a
        // planner/driver killer at scale, while a broadcast relation of the
        // same paths is a few MB the executors hash once.
        import spark.implicits._
        val pathsDf = withGraft.map(_.path).toDF("path")
        Some(spark.read.schema(dvSchema).parquet(dirs: _*)
          .join(broadcast(pathsDf), Seq("path"), "left_semi"))
      }
    val std = standardDvDf(spark, log, files)
    (graft, std) match {
      case (Some(g), Some(s)) => Some(g.unionByName(s))
      case _ => graft.orElse(std)
    }
  }

  /** (path, pos) rows of the standard `add.deletionVector` descriptors on
    * `files`. The descriptor list is metadata-scale on the driver; bitmap
    * decode — ranged file reads, inline Z85 — runs on EXECUTORS, one task
    * span per slice of files, so a 10⁵-file DV table never materializes
    * position lists driver-side. A graft-DML superseded descriptor is
    * cleared from its Add ([[graft.delta.Dml]]), so a file never carries
    * live positions in both formats. */
  private def standardDvDf(spark: SparkSession, log: DeltaLog,
                           files: Seq[AddAction]): Option[DataFrame] = {
    val withStd = files.filter(_.deletionVector.isDefined)
    if (withStd.isEmpty) return None
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val tableDir = log.tablePath.toString
    import spark.implicits._
    val slices = math.max(1, math.min(withStd.size,
      spark.sparkContext.defaultParallelism))
    val ds = spark.createDataset(withStd.map(a => (a.path, a.deletionVector.get)))
      .repartition(slices)
    Some(ds.flatMap { case (path, descJson) =>
      val desc = StandardDv.parse(descJson)
      StandardDv.readPositions(serConf.value, new Path(tableDir), desc)
        .map(pos => (path, pos))
    }.toDF("path", "pos"))
  }

  /** Scan `files` with existing DVs applied AND per-row provenance exposed:
    * output = table columns ++ (PathCol: table-relative file path,
    * PosCol: row index). This is the substrate DV-writing DML reads — the
    * positions it selects are exactly the coordinates a future scan's
    * anti-join will subtract. */
  /** `extraDataCols`: additional PHYSICAL parquet columns to read beyond
    * the table schema (row tracking's materialized id columns live in the
    * files but not in the schema); files lacking one serve nulls. */
  def scanWithPos(spark: SparkSession, log: DeltaLog, snap: Snapshot,
                  files: Seq[AddAction],
                  extraDataCols: Seq[StructField] = Nil): DataFrame = {
    val index = new GraftFileIndex(spark, log, snap, Some(files))
    val rel = HadoopFsRelation(index, index.partitionSchema,
      StructType(index.dataSchema.fields ++ extraDataCols),
      None, new ParquetFileFormat(), Map.empty)(spark)
    val wm = LogicalRelation(rel).withMetadataColumns()
    wm.setTagValue(AppliedTag, true)
    val df = org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark, wm)
    val withCols = df
      .withColumn(PathCol, relPathCol(log, col("_metadata.file_path")))
      .withColumn(PosCol, col("_metadata.row_index"))
    val filtered = dvDf(spark, log, files) match {
      case Some(dv) =>
        withCols.join(dv,
          withCols(PathCol) === dv("path") && withCols(PosCol) === dv("pos"),
          "left_anti")
      case None => withCols
    }
    // the index exposes the PHYSICAL schema on a name-mapped table — the
    // output keeps those at-rest names (callers stage protocol-correct
    // change files from them; mapped tables cannot carry graft DVs, so the
    // anti-join above is a no-op there)
    val outNames =
      if (ColumnMapping.isMapped(snap))
        ColumnMapping.physicalSchema(snap.schema).fieldNames
      else snap.schema.fieldNames
    filtered.select(
      (outNames.map(n => col(DeltaSchema.quoted(n))).toSeq
        ++ extraDataCols.map(f => col(s"`${f.name}`"))
        :+ col(PathCol) :+ col(PosCol)): _*)
  }

  /** DataFrame-level DV filter for internal scans that build their own
    * relation (DML rewrite subsets, OPTIMIZE) — `df` must be the direct
    * scan of `files` with the table's columns; returns it with deleted rows
    * subtracted. The relation inside `df` should be tagged [[AppliedTag]]
    * by the caller when the session runs [[ApplyDeletionVectors]]. */
  def filterDeleted(spark: SparkSession, log: DeltaLog,
                    files: Seq[AddAction], df: DataFrame): DataFrame =
    dvDf(spark, log, files) match {
      case None => df
      case Some(dv) =>
        // bind _metadata to df's side explicitly — the DV frame is itself a
        // parquet read and exposes its own _metadata (ambiguous otherwise)
        val meta = df.metadataColumn("_metadata")
        val f = relPathCol(log, meta.getField("file_path"))
        df.join(dv, f === dv("path") && meta.getField("row_index") === dv("pos"),
            "left_anti")
          .select(df.columns.map(n => col(DeltaSchema.quoted(n))).toSeq: _*)
    }
}

/** Resolution rule: rewrite every read of a DV-carrying graft scan into the
  * anti-join described on [[DeletionVectors]]. Runs during analysis so the
  * optimizer afterwards pushes data filters through the join's left side
  * into the parquet scan as usual. Write-target relations (INSERT INTO)
  * are skipped — their round-trip through [[GraftDeltaInserts]] must see
  * the raw relation. */
final class ApplyDeletionVectors(session: SparkSession) extends Rule[LogicalPlan] {
  import DeletionVectors._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val writeTargets = plan.collect {
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement => i.table
      case w: org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand => w.table
    }
    plan.resolveOperatorsDown {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if fs.location.isInstanceOf[GraftFileIndex] &&
             lr.getTagValue(AppliedTag).isEmpty &&
             !writeTargets.exists(_ eq lr) =>
        val index = fs.location.asInstanceOf[GraftFileIndex]
        val files = index.statsFiles
        if (!anyDv(files)) {
          // cheap common case: tag so repeat fixpoint visits skip the scan
          lr.setTagValue(AppliedTag, true)
          lr
        } else rewrite(lr, index, files)
    }
  }

  private def rewrite(lr: LogicalRelation, index: GraftFileIndex,
                      files: Seq[AddAction]): LogicalPlan = {
    val wm = lr.withMetadataColumns()
    wm.setTagValue(AppliedTag, true)
    val df = org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(session, wm)
    val dv = dvDf(session, index.log, files).get
    val joined = df.join(dv,
      relPathCol(index.log, col("_metadata.file_path")) === dv("path") &&
        col("_metadata.row_index") === dv("pos"),
      "left_anti")
    Project(lr.output, joined.queryExecution.analyzed)
  }
}
