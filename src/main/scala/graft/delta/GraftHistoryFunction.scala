package graft.delta

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._

/** `SELECT * FROM graft_history('/path/to/table')` — the SQL face of
  * `DeltaTable.history` (DESCRIBE HISTORY's role for graft-delta tables),
  * registered as a table-valued function by [[GraftSparkExtensions]].
  *
  * One row per commit: version, commit-file mtime (epoch millis), the
  * commitInfo `operation` when recorded, and the full commitInfo JSON.
  * Short histories materialize at resolution time (pooled commit reads);
  * above [[distributedThreshold]] commits, the rows are BUILT ON THE
  * EXECUTORS from a text scan of the commit files — at 10⁵ commits with
  * fat commitInfo payloads the driver path allocates tens of MB of Row
  * objects before the query even plans (r7 verdict #2). */
object GraftHistoryFunction {

  private val schema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("operation", StringType, nullable = true),
    StructField("commit_info", StringType, nullable = true)))

  /** Histories with at least this many commits build their rows on the
    * executors. Default 1000: below it the scan job's fixed overhead beats
    * the driver allocation it saves. */
  val ThresholdKey = "spark.graft.history.distributedThreshold"
  private def distributedThreshold(spark: SparkSession): Long =
    spark.conf.getOption(ThresholdKey).map(_.toLong).getOrElse(1000L)

  private def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1 && exprs.head.foldable,
      "graft_history expects one constant path argument")
    val path = String.valueOf(exprs.head.eval(null))
    val spark = SparkSession.active
    val log = DeltaLog.forPath(spark, path)
    val versions = log.listCommitVersions()
    if (versions.isEmpty) throw new NotATableException(path)
    val df =
      if (versions.size >= distributedThreshold(spark)) distributed(spark, log, versions)
      else driverSide(spark, log, versions)
    df.queryExecution.analyzed
  }

  /** Driver path: commit reads fan out on the driver pool — 10⁴ sequential
    * FS round trips would stall history queries on object stores. */
  private def driverSide(spark: SparkSession, log: DeltaLog,
                         versions: Seq[Long]): org.apache.spark.sql.DataFrame = {
    val rows = GraftWriter.inDriverPool(versions) { v =>
      val info = log.readCommit(v).collectFirst { case c: CommitInfoAction => c.info }
      Row(v, log.versionTimestamp(v),
        info.flatMap(n => Option(n.get("operation")).map(_.asText)).orNull,
        info.map(_.toString).orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** Executor path: the version list parallelizes out and each task reads
    * its commit files straight off the FS — version from the partition's
    * elements, timestamp from `getFileStatus` (the same FS mtime
    * [[DeltaLog.versionTimestamp]] serves), commitInfo parsed by the SAME
    * [[ActionCodec]] the driver path uses. Direct FS reads, not a
    * `spark.read.text` scan: the file-source machinery costs ~2 ms/file of
    * open/split ceremony, which at 10⁴ KB-sized commit files is 20 s of
    * pure overhead (measured) versus ~1 s for raw reads. Conf travels as
    * key-value pairs ([[GraftWriter.executorSideStats]]'s pattern). */
  private def distributed(spark: SparkSession, deltaLog: DeltaLog,
                          versions: Seq[Long]): org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    val confPairs = spark.sessionState.newHadoopConf().iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val logPathStr = deltaLog.commitFile(0).getParent.toString
    // ICT handover point, resolved driver-side once: versions it governs
    // report the commitInfo clock (already parsed below), older ones mtime
    val cfg = TableConfig.of(
      if (deltaLog.snapshot.version < 0) deltaLog.update() else deltaLog.snapshot)
    val ictFrom: Long =
      if (TableConfig.inCommitTimestampsEnabled(cfg))
        TableConfig.ictEnablementVersion(cfg)
      else Long.MaxValue
    val slices = math.min(versions.size,
      math.max(1, spark.sparkContext.defaultParallelism * 2))
    val rdd = spark.sparkContext.parallelize(versions, slices)
      .mapPartitions { vs =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        confPairs.foreach { case (k, v) => c.set(k, v) }
        val logPath = new org.apache.hadoop.fs.Path(logPathStr)
        val fs = logPath.getFileSystem(c)
        vs.map { v =>
          val p = new org.apache.hadoop.fs.Path(logPath, DeltaLog.pad20(v) + ".json")
          val mtime = fs.getFileStatus(p).getModificationTime
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
          val info =
            try Iterator.continually(in.readLine()).takeWhile(_ != null)
              .filter(_.nonEmpty).flatMap(ActionCodec.fromJsonLine)
              .collectFirst { case ci: CommitInfoAction => ci.info }
            finally in.close()
          val ict =
            if (v >= ictFrom)
              info.flatMap(n => Option(n.get("inCommitTimestamp"))
                .filterNot(_.isNull).map(_.asLong))
            else None
          Row(v, ict.getOrElse(mtime),
            info.flatMap(n => Option(n.get("operation")).map(_.asText)).orNull,
            info.map(_.toString).orNull)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("graft_history"),
      new ExpressionInfo(getClass.getName, "graft_history"),
      build)
}

/** `SELECT * FROM graft_detail('/path/to/table')` — DESCRIBE DETAIL's role:
  * one row summarizing the live snapshot (version, file count/bytes, exact
  * row count when every Add carries stats, partitioning, properties,
  * schema). All answered from the already-replayed log — no data files are
  * touched. */
object GraftDetailFunction {

  private val schema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("num_files", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("num_records", LongType, nullable = true),
    StructField("partition_columns", StringType, nullable = false),
    StructField("clustering_columns", StringType, nullable = false),
    StructField("properties", StringType, nullable = false),
    StructField("domain_metadata", StringType, nullable = false),
    StructField("created_time_ms", LongType, nullable = true),
    StructField("schema_json", StringType, nullable = true)))

  private def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1 && exprs.head.foldable,
      "graft_detail expects one constant path argument")
    val path = String.valueOf(exprs.head.eval(null))
    val spark = SparkSession.active
    val log = DeltaLog.forPath(spark, path)
    val snap = log.update()
    if (snap.version < 0) throw new NotATableException(path)
    val props = TableConfig.of(snap)
    def jsonOf(m: Seq[(String, String)]): String =
      ActionCodec.mapper.writeValueAsString(
        m.foldLeft(ActionCodec.mapper.createObjectNode()) {
          case (o, (k, v)) => o.put(k, v)
        })
    val row = Row(
      log.tablePath.toString,
      snap.version,
      snap.files.size.toLong,
      snap.files.map(_.size).sum,
      snap.statistics.numRecords.map(Long.box).orNull,
      snap.partitionColumns.mkString(","),
      new DeltaTable(log, snap).clusteringColumns.mkString(","),
      jsonOf(props.toSeq.sortBy(_._1)),
      jsonOf(snap.domainMetadata.toSeq.sortBy(_._1)),
      snap.metadata.flatMap(_.createdTime).map(Long.box).orNull,
      snap.metadata.map(_.schemaString).orNull)
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(row), 1), schema)
      .queryExecution.analyzed
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("graft_detail"),
      new ExpressionInfo(getClass.getName, "graft_detail"),
      build)
}
