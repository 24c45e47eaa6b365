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
  * History is table-metadata-scale (one row per commit, bounded by
  * checkpoint cadence), so materializing it at resolution time is cheap. */
object GraftHistoryFunction {

  private val schema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("operation", StringType, nullable = true),
    StructField("commit_info", StringType, nullable = true)))

  private def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1 && exprs.head.foldable,
      "graft_history expects one constant path argument")
    val path = String.valueOf(exprs.head.eval(null))
    val spark = SparkSession.active
    val log = DeltaLog.forPath(spark, path)
    val versions = log.listCommitVersions()
    if (versions.isEmpty) throw new NotATableException(path)
    // commit reads fan out on the driver pool — 10⁴ sequential FS round
    // trips would stall history queries on object stores
    val rows = GraftWriter.inDriverPool(versions) { v =>
      val info = log.readCommit(v).collectFirst { case c: CommitInfoAction => c.info }
      Row(v, log.versionTimestamp(v),
        info.flatMap(n => Option(n.get("operation")).map(_.asText)).orNull,
        info.map(_.toString).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
      .queryExecution.analyzed
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
    StructField("properties", StringType, nullable = false),
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
    val row = Row(
      log.tablePath.toString,
      snap.version,
      snap.files.size.toLong,
      snap.files.map(_.size).sum,
      snap.statistics.numRecords.map(Long.box).orNull,
      snap.partitionColumns.mkString(","),
      ActionCodec.mapper.writeValueAsString(
        props.toSeq.sortBy(_._1).foldLeft(ActionCodec.mapper.createObjectNode()) {
          case (o, (k, v)) => o.put(k, v)
        }),
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
