package graft.delta

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, InsertableRelation, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** The relation `format("graft-delta")` reads resolve to: a
  * [[HadoopFsRelation]] over the snapshot's [[GraftFileIndex]] (so scans
  * keep whole-stage-codegen parquet reading, partition pruning and stats
  * skipping), plus [[InsertableRelation]] so `INSERT INTO` / `INSERT
  * OVERWRITE` on a catalog table route through the transaction log.
  *
  * The insert hook is load-bearing for correctness, not a convenience:
  * Spark's analyzer prefers the `InsertableRelation` plan
  * (`InsertIntoDataSourceCommand`) over the raw-`HadoopFsRelation` path
  * (`InsertIntoHadoopFsRelationCommand`) — and the latter writes parquet
  * files straight into the table directory with **no log commit**,
  * producing orphan data invisible to every snapshot. */
/** Parquet format whose WRITE path is disabled: any plan that tries to
  * write files directly through the relation (Spark's
  * `InsertIntoHadoopFsRelationCommand`, reached for partitioned-table
  * INSERTs when [[GraftSparkExtensions]] is not registered) fails before a
  * single file lands, instead of silently committing nothing to the log.
  * Reads are untouched. */
final class GraftParquetFileFormat extends ParquetFileFormat {
  override def prepareWrite(sparkSession: SparkSession,
                            job: org.apache.hadoop.mapreduce.Job,
                            options: Map[String, String],
                            dataSchema: StructType): org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new IllegalStateException(
      "direct file writes would bypass the graft-delta transaction log; set " +
      "spark.sql.extensions=graft.delta.GraftSparkExtensions so INSERT INTO " +
      "partitioned graft-delta tables commits through the log")
}

final class GraftDeltaRelation(
    index: GraftFileIndex, timeTravel: Boolean, spark: SparkSession)
  extends HadoopFsRelation(index, index.partitionSchema, index.dataSchema,
    None, new GraftParquetFileFormat(), Map.empty)(spark)
  with InsertableRelation {

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    if (timeTravel) throw new IllegalStateException(
      "cannot INSERT into a time-travel (versionAsOf/timestampAsOf) relation")
    // the query's columns arrive positionally aligned (and already cast) to
    // this relation's output = dataSchema ++ partitionSchema; rename
    // positionally, then restore the table's declared column order
    val renamed = data.toDF(schema.fieldNames.toSeq: _*)
    val ordered = renamed.select(index.snapshot.schema.fieldNames.map(n => col(graft.delta.DeltaSchema.quoted(n))).toSeq: _*)
    GraftWriter.write(ordered, index.log.tablePath.toString,
      if (overwrite) SaveMode.Overwrite else SaveMode.Append,
      index.snapshot.partitionColumns)
    index.log.update()
  }
}

/** `format("graft-delta")` packaging — the idiomatic Spark entry points over
  * the engine, so a user needs no graft imports at the call site:
  *
  * {{{
  *   spark.read.format("graft-delta").load(path)                 // open_table
  *   spark.read.format("graft-delta")
  *     .option("versionAsOf", 3).load(path)                      // time travel
  *   df.write.format("graft-delta").mode("append")
  *     .option("partitionBy", "year,month").save(path)           // writer
  *   df.writeStream.format("graft-delta")
  *     .option("appId", "job-1").option("checkpointLocation", …)
  *     .start(path)                                              // exactly-once sink
  * }}}
  *
  * Read/write are thin delegations to [[DeltaTable]]/[[GraftWriter]]; the
  * streaming sink wraps [[graft.streaming.GraftStreamSink]] (txn-idempotent
  * per epoch). For partitioned tables the format read surfaces partition
  * columns after data columns (HadoopFsRelation convention).
  */
final class GraftDeltaSource extends RelationProvider
  with CreatableRelationProvider with StreamSinkProvider with StreamSourceProvider
  with DataSourceRegister
  with org.apache.spark.sql.connector.catalog.TableProvider {

  override def shortName(): String = "graft-delta"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-delta requires a path (use .load(path)/.save(path))"))

  // ---- TableProvider ----------------------------------------------------
  // Declaring the source "V2" routes SQL DDL (CREATE TABLE / CTAS / ALTER)
  // through the catalog plugin ([[graft.delta.catalog.GraftCatalog]]) for
  // transactional, log-first DDL. Execution stays V1: the returned
  // [[graft.delta.catalog.GraftTable]] advertises no batch/stream
  // read-write capability, so every read/write/stream entry point falls
  // back to the optimized relation/sink paths below (Spark gates each
  // fallback on the table's capabilities).

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: org.apache.spark.sql.util.CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-delta requires a path"))
    DeltaTable.forPath(SparkSession.active, path).schema
  }

  override def inferPartitioning(options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : Array[org.apache.spark.sql.connector.expressions.Transform] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-delta requires a path"))
    // called unconditionally by getTableFromProvider, including for WRITES
    // to not-yet-existing tables (df.write / writeStream to a new path) —
    // an empty partitioning, not an error, is the correct answer there
    val snap = DeltaLog.forPath(SparkSession.active, path).update()
    if (snap.version < 0) Array.empty
    else snap.partitionColumns
      .map(org.apache.spark.sql.connector.expressions.Expressions.identity).toArray
  }

  override def getTable(schema: StructType,
                        partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
                        properties: java.util.Map[String, String]): org.apache.spark.sql.connector.catalog.Table = {
    val path = Option(properties.get("path"))
      .orElse(Option(properties.get("location")))
      .getOrElse(throw new IllegalArgumentException("graft-delta requires a path"))
    val partCols = org.apache.spark.sql.graftbridge.CatalogBridge
      .identityPartitionNames(partitioning).collect { case Right(name) => name }
    new graft.delta.catalog.GraftTable(path, schema, partCols,
      scala.jdk.CollectionConverters.MapHasAsScala(properties).asScala.toMap
        .filterNot(_._1 == "location") + ("path" -> path))
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val timeTravel = parameters.contains("versionAsOf") || parameters.contains("timestampAsOf")
    // timestampAsOf accepts epoch millis OR a timestamp string — the
    // catalog's loadTable(ident, timestamp) supplies ISO-8601 Instants
    // ("2026-01-01T00:00:00Z"); a bare-millis-only parse would crash the
    // exact option the catalog path produces
    def tsMillis(ts: String): Long =
      scala.util.Try(ts.toLong).getOrElse(
        scala.util.Try(java.time.Instant.parse(ts).toEpochMilli).getOrElse(
          java.sql.Timestamp.valueOf(ts.replace('T', ' ')).getTime))
    val table = (parameters.get("versionAsOf"), parameters.get("timestampAsOf")) match {
      case (Some(v), _) => DeltaTable.forPath(spark, path, v.toLong)
      case (None, Some(ts)) => DeltaTable.forPathAsOf(spark, path, tsMillis(ts))
      case _ => DeltaTable.forPath(spark, path)
    }
    // the format relation relies on [[ApplyDeletionVectors]] for DV
    // subtraction; a session without the extensions would silently read
    // deleted rows — fail instead
    if (DeletionVectors.anyDv(table.snapshot.files) &&
        !spark.sparkContext.getConf.get("spark.sql.extensions", "")
          .contains("GraftSparkExtensions"))
      throw new IllegalStateException(
        s"table $path carries deletion vectors; reading it through " +
        "format(\"graft-delta\") requires " +
        "spark.sql.extensions=graft.delta.GraftSparkExtensions " +
        "(or use DeltaTable.forPath)")
    // the V1 relation's output IS the index schema — on a column-mapped
    // table that would surface physical col-<uuid> names to the user.
    // The catalog path opts in ([[GraftV2Fallback]] wraps the relation in
    // a physical→logical aliasing Project); DeltaTable.forPath aliases in
    // its own projection; a direct format() read has nowhere to.
    if (ColumnMapping.isMapped(table.snapshot) &&
        !parameters.contains(GraftDeltaSource.MappedReadKey))
      throw new UnsupportedProtocolException(
        s"column-mapped table $path cannot be read through " +
        "format(\"graft-delta\") directly; use DeltaTable.forPath or a " +
        "catalog table reference, which alias physical column names back " +
        "to logical")
    val index = new GraftFileIndex(spark, table.log, table.snapshot,
      live = !timeTravel)
    new GraftDeltaRelation(index, timeTravel, spark)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    val partitionBy = parameters.get("partitionBy")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean)
    val overwriteSchema = parameters.get("overwriteSchema").exists(_.toBoolean)
    GraftWriter.write(data, path, mode, partitionBy, mergeSchema, overwriteSchema)
    // the write COMMITTED — the returned relation must not throw (Spark
    // discards it anyway): building the read relation here re-runs read
    // fences (column mapping, DV extensions) that legitimately refuse even
    // though the write succeeded, and a thrown "failure" after a durable
    // commit makes orchestrator retries append duplicates
    val ctx = sqlContext
    new BaseRelation {
      override val sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }

  /** table cols + `_change_type` + `_commit_version` — the shape
    * [[ChangeDataFeed.readChanges]] serves, declared up front so the
    * streaming plan binds the change columns. */
  private def cdfSchema(tableSchema: StructType): StructType =
    StructType(tableSchema.fields :+
      org.apache.spark.sql.types.StructField(
        ChangeDataFeed.ChangeType, org.apache.spark.sql.types.StringType) :+
      org.apache.spark.sql.types.StructField(
        ChangeDataFeed.CommitVersion, org.apache.spark.sql.types.LongType,
        nullable = false))

  private def wantsCdf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val declared = schema.getOrElse(
      DeltaTable.forPath(sqlContext.sparkSession, pathOf(parameters)).schema)
    // a user-supplied schema may ALREADY carry the change columns (r7
    // ADVICE allows them anywhere) — wrapping again would duplicate them
    val out =
      if (wantsCdf(parameters) &&
          !declared.fieldNames.contains(ChangeDataFeed.ChangeType))
        cdfSchema(declared)
      else declared
    (shortName(), out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val log = DeltaLog.forPath(spark, path)
    val cdf = wantsCdf(parameters)
    val declared = schema match {
      // the engine hands back the (already CDF-shaped) schema it got from
      // sourceSchema — don't double-append the change columns
      case Some(s) if !cdf || s.fieldNames.contains(ChangeDataFeed.ChangeType) => s
      case Some(s) => cdfSchema(s)
      case None =>
        val snap = log.update()
        if (snap.version < 0) throw new NotATableException(path)
        if (cdf) cdfSchema(snap.schema) else snap.schema
    }
    new org.apache.spark.sql.graftbridge.GraftDeltaStreamSource(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], log, declared,
      maxVersionsPerTrigger = parameters.get("maxVersionsPerTrigger").map(_.toLong),
      maxFilesPerTrigger = parameters.get("maxFilesPerTrigger").map(_.toLong),
      maxBytesPerTrigger = parameters.get("maxBytesPerTrigger").map(_.toLong),
      startingVersion = parameters.get("startingVersion").map(_.toLong),
      metadataPath = Some(metadataPath),
      ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean),
      ignoreDeletes = parameters.get("ignoreDeletes").exists(_.toBoolean),
      readChangeFeed = cdf)
  }

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    val path = pathOf(parameters)
    val appId = parameters.getOrElse("appId",
      throw new IllegalArgumentException(
        "graft-delta sink requires an appId option (the txn idempotence key)"))
    val sink = new graft.streaming.GraftStreamSink(
      path, appId, partitionColumns, outputMode.toString,
      mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean))
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // the micro-batch DataFrame is bound to the streaming plan; rebind
        // it as a batch over the same rows before the transactional write
        sink.writeBatch(
          org.apache.spark.sql.graftbridge.ColumnBridge.rebatch(data), batchId)
        ()
      }
    }
  }
}

object GraftDeltaSource {
  /** Internal opt-in: the caller takes responsibility for aliasing the
    * relation's PHYSICAL column names back to logical (only
    * [[GraftV2Fallback]] — it wraps the scan in an aliasing Project). */
  private[delta] val MappedReadKey = "graft.internal.mappedRead"
}
