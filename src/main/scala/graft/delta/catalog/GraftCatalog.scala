package graft.delta.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Column => V2Column, DelegatingCatalogExtension, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType

import graft.delta._

/** Session-catalog extension in the DeltaCatalog role (the reference's
  * engine-integration surface, `rust/src/delta_datafusion.rs:38-125`, done
  * the Spark-native way): registered as
  * `spark.sql.catalog.spark_catalog = graft.delta.catalog.GraftCatalog`, it
  * intercepts catalog operations on `graft-delta` tables so SQL DDL is
  * transactional against the Delta log, and delegates everything else to the
  * built-in session catalog untouched.
  *
  *  - `CREATE TABLE ... USING graft-delta` initializes the `_delta_log`
  *    (schema, partition columns, validated `delta.*` TBLPROPERTIES) in a
  *    version-0 commit, or ADOPTS an existing table at the location (schema
  *    read from the log, like `CONVERT`/open-table semantics); the metastore
  *    entry is registered with the resolved schema either way.
  *  - CTAS works because the returned [[GraftTable]] accepts the planner's
  *    v2 `AppendData`/`OverwriteByExpression` through a `V1Write` funnel into
  *    [[GraftWriter]] — the same transactional write every other path uses.
  *  - `ALTER TABLE ... ADD COLUMNS / SET TBLPROPERTIES / UNSET
  *    TBLPROPERTIES` commit a metadata action to the log FIRST (schema
  *    evolution exactly as `mergeSchema` would produce), then update the
  *    metastore, so the log remains the source of truth.
  *  - `\`graft-delta\`.\`/abs/path\`` identifiers resolve without any
  *    metastore entry (path tables, `python/deltalake/table.py:193` role),
  *    including `VERSION AS OF` / `TIMESTAMP AS OF` time travel via the
  *    catalog's `loadTable(ident, version/timestamp)` entry points.
  *
  * Reads and writes stay on the existing optimized V1 path: the session
  * catalog returns V1 table metadata, so scans go through [[GraftFileIndex]]
  * (stats skipping, partition pruning) and inserts through the
  * `InsertableRelation` dispatch — the catalog adds resolution, not a
  * second execution engine.
  */
class GraftCatalog extends DelegatingCatalogExtension
  with org.apache.spark.sql.connector.catalog.StagingTableCatalog {

  private def spark: SparkSession = SparkSession.active

  private val Provider = "graft-delta"

  private def isGraftProvider(properties: util.Map[String, String]): Boolean =
    Option(properties.get(TableCatalog.PROP_PROVIDER)).exists(_.equalsIgnoreCase(Provider))

  /** `graft-delta`.`/abs/path` — a path table needs no metastore entry. */
  private def isPathIdent(ident: Identifier): Boolean =
    ident.namespace.length == 1 && ident.namespace.head.equalsIgnoreCase(Provider) &&
      ident.name.contains("/")

  /** Reserved/engine keys that must not leak into the table's Delta
    * configuration (they describe the metastore entry, not the table). */
  private def tableConfiguration(properties: util.Map[String, String]): Map[String, String] =
    properties.asScala.toMap.filterNot { case (k, _) =>
      k == TableCatalog.PROP_PROVIDER || k == TableCatalog.PROP_LOCATION ||
        k == TableCatalog.PROP_COMMENT || k == TableCatalog.PROP_OWNER ||
        k == TableCatalog.PROP_EXTERNAL || k == "is_managed_location" ||
        k == "transient_lastDdlTime" || k.startsWith("option.")
    }

  private def partitionColumnsOf(partitions: Array[Transform]): Seq[String] =
    org.apache.spark.sql.graftbridge.CatalogBridge.identityPartitionNames(partitions).map {
      case Right(name) => name
      case Left(other) => throw new IllegalArgumentException(
        s"graft-delta supports only identity partitioning, got $other " +
          "(use OPTIMIZE ZORDER for multi-dimensional clustering)")
    }

  private def locationOf(ident: Identifier, properties: util.Map[String, String]): String =
    Option(properties.get(TableCatalog.PROP_LOCATION)).getOrElse {
      val db = if (ident.namespace.nonEmpty) Some(ident.namespace.last) else None
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(ident.name, db)).toString
    }

  /** Build the resolution-time v2 handle from the CURRENT log state (the
    * log, not the metastore, is the schema's source of truth — a table
    * altered by another writer reads correctly without re-registering).
    * Time-travel options pin the handle's SCHEMA to the target version
    * too: resolving the latest schema over a pinned relation breaks on
    * any column added/dropped/retyped since the pin (unresolved
    * attributes / misdeclared types). */
  private def graftTable(location: String,
                         extraOptions: Map[String, String] = Map.empty): GraftTable = {
    val log = DeltaLog.forPath(spark, location)
    val latest = log.update()
    if (latest.version < 0) throw new NotATableException(location)
    val snap = (extraOptions.get("versionAsOf"),
        extraOptions.get("timestampAsOf")) match {
      case (Some(v), _) => log.snapshotForVersion(v.toLong)
      case (None, Some(ts)) =>
        DeltaTable.forPathAsOf(spark, location,
          java.time.Instant.parse(ts).toEpochMilli).snapshot
      case _ => latest
    }
    // StreamableGraftTable adds the V2TableWithV1Fallback hook so
    // readStream.table("name") resolves to the V1 streaming source
    new org.apache.spark.sql.graftbridge.StreamableGraftTable(
      location, snap.schema, snap.partitionColumns,
      Map("path" -> location) ++ extraOptions)
  }

  /** The graft-delta location of a NAMED catalog table, if it is one. */
  private def graftLocationOf(ident: Identifier): Option[String] =
    org.apache.spark.sql.graftbridge.CatalogBridge
      .asV1CatalogTable(super.loadTable(ident))
      .filter(_.provider.exists(_.equalsIgnoreCase(Provider)))
      .map(ct => ct.storage.properties.getOrElse("path", ct.location.getPath))

  override def loadTable(ident: Identifier): Table =
    if (isPathIdent(ident)) graftTable(ident.name)
    else {
      val base = super.loadTable(ident)
      org.apache.spark.sql.graftbridge.CatalogBridge.asV1CatalogTable(base)
        .filter(_.provider.exists(_.equalsIgnoreCase(Provider)))
        .map(ct => graftTable(ct.storage.properties.getOrElse("path", ct.location.getPath)))
        .getOrElse(base)
    }

  /** SQL `VERSION AS OF` through the catalog. */
  override def loadTable(ident: Identifier, version: String): Table =
    if (isPathIdent(ident))
      graftTable(ident.name, Map("versionAsOf" -> version))
    else graftLocationOf(ident)
      .map(loc => graftTable(loc, Map("versionAsOf" -> version)))
      .getOrElse(super.loadTable(ident, version))

  /** SQL `TIMESTAMP AS OF` through the catalog. Spark hands micros since
    * epoch; the reader option takes a timestamp string. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val ts = java.time.Instant.ofEpochSecond(
      timestamp / 1000000L, (timestamp % 1000000L) * 1000L).toString
    if (isPathIdent(ident)) graftTable(ident.name, Map("timestampAsOf" -> ts))
    else graftLocationOf(ident)
      .map(loc => graftTable(loc, Map("timestampAsOf" -> ts)))
      .getOrElse(super.loadTable(ident, timestamp))
  }

  override def createTable(ident: Identifier, columns: Array[V2Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    createTableTracked(ident, columns, partitions, properties)._1

  /** Like createTable, also reporting whether THIS call initialized the
    * delta log (vs adopting an existing one) — stageCreate's abort must
    * roll back a log it created, and only that. */
  private def createTableTracked(ident: Identifier, columns: Array[V2Column],
                                 partitions: Array[Transform],
                                 properties: util.Map[String, String]): (Table, Boolean) = {
    if (!isGraftProvider(properties))
      return (super.createTable(ident, columns, partitions, properties), false)

    val declared = org.apache.spark.sql.graftbridge.CatalogBridge
      .v2ColumnsToStructType(columns)
    // CREATE TABLE ... CLUSTER BY (…) — authored as the delta.clustering
    // domain at version 0; the remaining transforms must be identity
    val clusterCols = org.apache.spark.sql.graftbridge.CatalogBridge
      .clusterByColumns(partitions)
    val dataTransforms = org.apache.spark.sql.graftbridge.CatalogBridge
      .withoutClusterBy(partitions)
    val partCols = partitionColumnsOf(dataTransforms)
    val location = locationOf(ident, properties)
    val config = tableConfiguration(properties)
    TableConfig.validate(config)

    val log = DeltaLog.forPath(spark, location)
    val snap = log.update()
    val freshlyInitialized = snap.version < 0
    val resolvedSchema: StructType =
      if (snap.version >= 0) {
        // location already holds a Delta table: ADOPT it (open-table
        // semantics); a declared schema must agree with the log's on
        // names+types — same policy as the writer's append check
        // (nullability is not load-bearing for parquet round-trips), and
        // NTZ-normalized on BOTH sides: legacy metadata persisted NTZ as
        // timestamp, r11+ tables keep timestamp_ntz at rest — a
        // TIMESTAMP_NTZ DDL column must bind to either
        def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
        if (declared.nonEmpty &&
            shape(DeltaSchema.normalize(declared)) !=
              shape(DeltaSchema.normalize(snap.schema)))
          throw new IllegalArgumentException(
            s"declared schema $declared does not match existing graft-delta " +
              s"table at $location: ${snap.schema}")
        if (partCols.nonEmpty && partCols != snap.partitionColumns)
          throw new IllegalArgumentException(
            s"declared partitioning $partCols does not match existing table's " +
              s"${snap.partitionColumns}")
        if (clusterCols.nonEmpty) {
          val existing = new DeltaTable(log, snap).clusteringColumns
          if (existing != clusterCols) throw new IllegalArgumentException(
            s"declared CLUSTER BY $clusterCols does not match existing " +
              s"table's $existing")
        }
        // declared TBLPROPERTIES must AGREE with the adopted log (the
        // log is the source of truth) — previously they were validated
        // and silently dropped, so DESCRIBE showed e.g. appendOnly=true
        // while the log kept permitting deletes
        val existingCfg = TableConfig.of(snap)
        val mismatched = config.filter { case (k, v) =>
          !existingCfg.get(k).contains(v) }
        if (mismatched.nonEmpty) throw new IllegalArgumentException(
          s"declared TBLPROPERTIES ${mismatched.keys.mkString(", ")} do not " +
          s"match the existing graft-delta table at $location — adopt the " +
          "table first, then ALTER TABLE ... SET TBLPROPERTIES")
        snap.schema
      } else {
        if (declared.isEmpty) throw new IllegalArgumentException(
          s"CREATE TABLE on a new graft-delta location requires a column list " +
            s"(no Delta table exists at $location)")
        val missing = partCols.filterNot(declared.fieldNames.contains)
        if (missing.nonEmpty) throw new IllegalArgumentException(
          s"partition columns not in schema: $missing")
        val badCluster = clusterCols.filterNot(c =>
          declared.fieldNames.contains(c.split('.').head))
        if (badCluster.nonEmpty) throw new IllegalArgumentException(
          s"clustering columns not in schema: $badCluster")
        initializeTable(log, declared, partCols, config, clusterCols)
        declared
      }

    // metastore entry carries the resolved schema so DESCRIBE/column
    // resolution agree with the log
    val metastoreProps = new util.HashMap[String, String](properties)
    if (!metastoreProps.containsKey(TableCatalog.PROP_LOCATION))
      metastoreProps.put(TableCatalog.PROP_LOCATION, location)
    metastoreProps.put(TableCatalog.PROP_EXTERNAL, "true")
    super.createTable(ident,
      org.apache.spark.sql.graftbridge.CatalogBridge
        .structTypeToV2Columns(resolvedSchema),
      dataTransforms, metastoreProps)

    // the returned table is what CTAS writes into — it funnels the v2
    // append back into the transactional v1 writer
    (new GraftTable(location, resolvedSchema,
      if (partCols.nonEmpty) partCols else {
        val s = log.update(); if (s.version >= 0) s.partitionColumns else Nil
      },
      Map("path" -> location)), freshlyInitialized)
  }

  /** Version-0 commit of an empty table: protocol + metadata, no files —
    * the same shape the reference's `create` writes
    * (`rust/src/delta.rs:986-1035` via `prepare_commit`). */
  private def initializeTable(log: DeltaLog, schema: StructType,
                              partCols: Seq[String],
                              config: Map[String, String],
                              clusterCols: Seq[String] = Nil): Unit = {
    val now = System.currentTimeMillis()
    // pin the pre-create snapshot: a racing CREATE at the same path must
    // conflict-classify, not be silently skipped (r17 shared handles)
    val txn = log.startTransaction(log.update())
    // CREATE with column mapping declared: fresh col-<uuid> physical names
    // + ids from version 0 (no files exist, both modes are safe)
    val (annSchema, annConfig, (fr, fw)) =
      ColumnMappingDdl.forCreate(schema, config)
    // one folded fence: generated/identity column floors, DV / v2
    // checkpoints / ICT / variant / clustering declared at CREATE all land
    // in a single protocol action (configFences owns the schema-gated
    // floors since r12 — no per-call-site copies to diverge)
    val proto0 = ProtocolSupport.configFences(annConfig, ProtocolAction(fr, fw),
      Some(annSchema))
    txn.addAction(
      if (clusterCols.isEmpty) proto0
      else ProtocolSupport.writerFeaturesFence(proto0,
        Seq("domainMetadata", "clustering")))
    if (clusterCols.nonEmpty) {
      val cfgNode = ActionCodec.mapper.createObjectNode()
      val arr = cfgNode.putArray("clusteringColumns")
      clusterCols.foreach { c =>
        val p = arr.addArray(); c.split('.').foreach(p.add)
      }
      txn.addAction(DomainMetadataAction("delta.clustering",
        ActionCodec.mapper.writeValueAsString(cfgNode)))
    }
    txn.addAction(MetaDataAction(
      id = java.util.UUID.randomUUID().toString,
      name = None, description = None,
      format = Format(),
      schemaString = DeltaSchema.toJson(annSchema),
      partitionColumns = partCols,
      createdTime = Some(now),
      configuration = annConfig))
    val info = ActionCodec.mapper.createObjectNode()
    info.put("timestamp", now)
    info.put("operation", "CREATE TABLE")
    info.putObject("operationParameters")
      .put("partitionBy", partCols.mkString(","))
    txn.commit(Some(CommitInfoAction(info)))
  }

  // ---- StagingTableCatalog: CTAS / REPLACE / CREATE OR REPLACE ----------

  override def stageCreate(ident: Identifier, columns: Array[V2Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): org.apache.spark.sql.connector.catalog.StagedTable = {
    // CREATE has no replacement semantics: create fully up front (log v0 +
    // metastore), append into it, drop on abort
    val (created, freshLog) = createTableTracked(ident, columns, partitions, properties)
    created match {
      case gt: GraftTable =>
        new GraftStagedCreate(gt, () => {
          dropTable(ident)
          // roll back a log THIS create initialized, but never one that has
          // accrued commits since — the location must be reusable after a
          // failed CTAS, with any schema
          if (freshLog) {
            val log = DeltaLog.forPath(spark, gt.location)
            if (log.update().version == 0) {
              val logDir = new org.apache.hadoop.fs.Path(log.tablePath, "_delta_log")
              logDir.getFileSystem(spark.sessionState.newHadoopConf())
                .delete(logDir, true)
            }
          }
        })
      case other => new BestEffortStagedTable(other, () => dropTable(ident))
    }
  }

  override def stageReplace(ident: Identifier, columns: Array[V2Column],
                            partitions: Array[Transform],
                            properties: util.Map[String, String]): org.apache.spark.sql.connector.catalog.StagedTable =
    stageReplaceInternal(ident, columns, partitions, properties, orCreate = false)

  override def stageCreateOrReplace(ident: Identifier, columns: Array[V2Column],
                                    partitions: Array[Transform],
                                    properties: util.Map[String, String]): org.apache.spark.sql.connector.catalog.StagedTable =
    stageReplaceInternal(ident, columns, partitions, properties, orCreate = true)

  private def stageReplaceInternal(ident: Identifier, columns: Array[V2Column],
                                   partitions: Array[Transform],
                                   properties: util.Map[String, String],
                                   orCreate: Boolean): org.apache.spark.sql.connector.catalog.StagedTable = {
    if (!isGraftProvider(properties)) {
      // delegate-backed replace: non-atomic drop + create, like a
      // non-staging session catalog would do
      if (tableExists(ident)) dropTable(ident)
      else if (!orCreate) throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
      return new BestEffortStagedTable(
        super.createTable(ident, columns, partitions, properties),
        () => dropTable(ident))
    }
    val existing = tableExists(ident)
    if (!existing && !orCreate)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val declared = org.apache.spark.sql.graftbridge.CatalogBridge
      .v2ColumnsToStructType(columns)
    if (declared.isEmpty) throw new IllegalArgumentException(
      "REPLACE TABLE ... USING graft-delta requires a column list or AS SELECT")
    // CLUSTER BY arrives as a transform like on CREATE — strip it before
    // the identity-partitioning check (REPLACE with the clause previously
    // crashed on "supports only identity partitioning")
    if (org.apache.spark.sql.graftbridge.CatalogBridge
        .clusterByColumns(partitions).nonEmpty)
      throw new IllegalArgumentException(
        "REPLACE TABLE ... CLUSTER BY is not supported — REPLACE the table " +
        "first, then declare clustering with ALTER TABLE ... CLUSTER BY")
    val partCols = partitionColumnsOf(
      org.apache.spark.sql.graftbridge.CatalogBridge.withoutClusterBy(partitions))
    val missing = partCols.filterNot(declared.fieldNames.contains)
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"partition columns not in schema: $missing")
    // keep the EXISTING table's location on replace (REPLACE changes
    // contents and schema, not identity)
    val location = graftLocationOf(ident).getOrElse(locationOf(ident, properties))
    val config = tableConfiguration(properties)
    TableConfig.validate(config)
    new GraftStagedTable(location, declared, partCols, config, () => {
      // metastore sync after the one-commit overwrite
      if (tableExists(ident)) dropTable(ident)
      val metastoreProps = new util.HashMap[String, String](properties)
      if (!metastoreProps.containsKey(TableCatalog.PROP_LOCATION))
        metastoreProps.put(TableCatalog.PROP_LOCATION, location)
      metastoreProps.put(TableCatalog.PROP_EXTERNAL, "true")
      super.createTable(ident,
        org.apache.spark.sql.graftbridge.CatalogBridge.structTypeToV2Columns(declared),
        partitions, metastoreProps)
    })
  }

  private def isSchemaChange(c: TableChange): Boolean =
    c.isInstanceOf[TableChange.AddColumn] ||
      c.isInstanceOf[TableChange.RenameColumn] ||
      c.isInstanceOf[TableChange.DeleteColumn]

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    // path identifiers (graft-delta.`/abs/path`) have no metastore entry —
    // route straight to the log, like loadTable does (previously ALTER on
    // a path table died in the metastore lookup)
    if (isPathIdent(ident)) {
      alterDeltaLog(ident.name, changes)
      return loadTable(ident)
    }
    graftLocationOf(ident) match {
      case Some(location) =>
        alterDeltaLog(location, changes)
        // Sync the metastore's cosmetic schema copy (reads resolve through
        // the log). Hive-style catalogs require partition columns LAST, so
        // re-derive the full schema with added columns before them instead
        // of delegating the raw AddColumn (which appends at the very end).
        val snap = DeltaLog.forPath(spark, location).update()
        val pc = snap.partitionColumns
        if (changes.exists(isSchemaChange)) {
          val reordered = StructType(
            snap.schema.fields.filterNot(f => pc.contains(f.name)) ++
              pc.flatMap(c => snap.schema.fields.find(_.name == c)))
          val db = if (ident.namespace.nonEmpty) Some(ident.namespace.last) else None
          spark.sessionState.catalog.alterTableSchema(
            org.apache.spark.sql.catalyst.TableIdentifier(ident.name, db), reordered)
        }
        val rest = changes.filterNot(isSchemaChange)
        if (rest.nonEmpty) super.alterTable(ident, rest: _*)
        loadTable(ident)
      case None => super.alterTable(ident, changes: _*)
    }
  }

  /** Apply ALTER changes to the Delta log; the log, not the metastore, is
    * what every reader replays. RENAME/DROP COLUMN and column-mapping mode
    * flips route to their dedicated protocol-aware commits
    * ([[ColumnMappingDdl]]); the rest folds into ONE metadata commit. */
  private def alterDeltaLog(location: String, changes: Seq[TableChange]): Unit = {
    // dedicated-path changes (each a statement of its own in SQL)
    changes.foreach {
      case r: TableChange.RenameColumn =>
        ColumnMappingDdl.renameColumn(spark, location,
          r.fieldNames.mkString("."), r.newName)
      case d: TableChange.DeleteColumn =>
        ColumnMappingDdl.dropColumn(spark, location, d.fieldNames.mkString("."))
      case s: TableChange.SetProperty if s.property == ColumnMapping.ModeKey =>
        // the same upgrade routing as the API path (none → name only)
        DeltaTable.forPath(spark, location)
          .setProperties(Map(s.property -> s.value))
      case cb: TableChange.ClusterBy =>
        // ALTER TABLE ... CLUSTER BY (…) re-declares the clustering
        // domain; CLUSTER BY NONE (empty column list) removes it
        val cols = cb.clusteringColumns.toSeq.map(_.fieldNames().mkString("."))
        val dt = DeltaTable.forPath(spark, location)
        if (cols.nonEmpty) dt.clusterBy(cols)
        else if (dt.domainMetadata.contains(dt.ClusteringDomain))
          dt.removeDomainMetadataInternal(dt.ClusteringDomain)
      case _ => ()
    }
    val rest = changes.filterNot(c => isSchemaChange(c) &&
        !c.isInstanceOf[TableChange.AddColumn])
      .filterNot {
        case s: TableChange.SetProperty => s.property == ColumnMapping.ModeKey
        case _: TableChange.ClusterBy => true
        case _ => false
      }
    if (rest.isEmpty) return

    val log = DeltaLog.forPath(spark, location)
    val snap = log.update()
    if (snap.version < 0) throw new IllegalStateException(
      s"no graft-delta table at $location")
    val meta = snap.metadata.getOrElse(throw new IllegalStateException(
      s"table at $location has no metadata action"))
    val mapped = ColumnMapping.isMapped(snap)

    var schema = snap.schema
    var config = TableConfig.of(snap)
    var maxId = ColumnMappingDdl.maxColumnId(config)
    rest.foreach {
      case add: TableChange.AddColumn =>
        if (add.fieldNames.length != 1) throw new IllegalArgumentException(
          "graft-delta supports adding top-level columns only, got " +
            add.fieldNames.mkString("."))
        if (schema.fieldNames.contains(add.fieldNames.head))
          throw new IllegalArgumentException(
            s"column ${add.fieldNames.head} already exists")
        // added columns must be absent-tolerant: old files simply lack them
        if (!add.isNullable) throw new IllegalArgumentException(
          "added columns must be nullable: existing files have no values for them")
        var field = org.apache.spark.sql.types.StructField(
          add.fieldNames.head, add.dataType, nullable = true)
        if (mapped) {
          // mapped tables: new columns need a fresh id and col-<uuid>
          // physical name — files written from now on carry them
          val (af, nid) = ColumnMappingDdl.allocateField(field, maxId)
          field = af; maxId = nid
          config = config + (ColumnMappingDdl.MaxColumnIdKey -> maxId.toString)
        }
        schema = StructType(schema.fields :+ field)
      case set: TableChange.SetProperty =>
        TableConfig.validate(Map(set.property -> set.value))
        config = config + (set.property -> set.value)
      case rm: TableChange.RemoveProperty =>
        if (mapped && (rm.property == ColumnMapping.ModeKey ||
            rm.property == ColumnMappingDdl.MaxColumnIdKey))
          throw new UnsupportedProtocolException(
            "unsupported Delta table: unsetting the column-mapping " +
            "properties of a mapped table would flip every scan to " +
            "logical names no file carries")
        config = config - rm.property
      case other => throw new IllegalArgumentException(
        s"graft-delta does not support ALTER change $other")
    }

    val txn = log.startTransaction(snap)
    if (mapped) txn.permitNameMappedCommit()
    txn.addAction(meta.copy(
      schemaString = DeltaSchema.toJson(schema),
      configuration = config))
    // same folded fence as DeltaTable.setProperties — SQL ALTER must not
    // be a fence-less side door into DV / v2 checkpoints / ICT
    val protoBase = ProtocolAction(snap.minReaderVersion,
      snap.minWriterVersion, snap.readerFeatures, snap.writerFeatures)
    val fenced = ProtocolSupport.configFences(config, protoBase, Some(schema))
    if (fenced != protoBase) txn.addAction(fenced)
    val info = ActionCodec.mapper.createObjectNode()
    info.put("timestamp", System.currentTimeMillis())
    info.put("operation", "ALTER TABLE")
    txn.commit(Some(CommitInfoAction(info)))
  }
}
