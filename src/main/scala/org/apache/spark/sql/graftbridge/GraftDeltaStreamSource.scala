package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

import graft.delta.{AddAction, DeltaLog}

/** V1 Structured Streaming source tailing a Delta transaction log — the
  * reference's "stream table update" (`update_incremental` polling,
  * `rust/src/delta.rs:635-638`) as a first-class `readStream` source.
  *
  * Offsets are table versions: each micro-batch reads the files added in
  * `(startVersion, endVersion]` with `dataChange = true` (compaction
  * commits are invisible, `rust/src/action.rs:166-170`). Offset tracking +
  * the checkpointLocation give end-to-end exactly-once with the
  * `graft-delta` sink's txn idempotence.
  *
  * Lives in the bridge package because the V1 `Source`/`Offset` interfaces
  * are `private[sql]`; all Delta-log logic stays in `graft.delta`.
  */
final class GraftDeltaStreamSource(
    spark: SparkSession,
    log: DeltaLog,
    override val schema: StructType,
    maxVersionsPerTrigger: Option[Long] = None) extends Source {

  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  /** Highest version already offered as a batch end — the throttle anchor.
    * -1 until the first batch; recovered from the engine's first getBatch
    * call after a restart. */
  @volatile private var lastOffered: Long = -1L

  override def getOffset: Option[V1Offset] = {
    val latest = log.update().version
    if (latest < 0) None
    else {
      // Rate limiting: a backfill over a 10⁴-version history must not land
      // in one micro-batch; cap each trigger at maxVersionsPerTrigger
      // versions past the last offered end.
      val capped = maxVersionsPerTrigger match {
        case Some(max) if lastOffered >= 0 => math.min(latest, lastOffered + max)
        case Some(max) => math.min(latest, max - 1) // first trigger: versions 0..max-1
        case None => latest
      }
      Some(LongOffset(capped))
    }
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val startV = start.map(versionOf).getOrElse(-1L)
    val endV = versionOf(end)
    lastOffered = math.max(lastOffered, endV)
    val adds: Seq[AddAction] = log.listCommitVersions()
      .filter(v => v > startV && v <= endV)
      .flatMap(log.readCommit)
      .collect { case a: AddAction if a.dataChange => a }
    val batch =
      if (adds.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else
        spark.read
          .option("basePath", log.tablePath.toString)
          .schema(schema)
          .parquet(adds.map(a =>
            new org.apache.hadoop.fs.Path(log.tablePath, a.path).toString): _*)
    // streaming-tagged DataFrame over the same (lazy) rows, as file/kafka
    // sources do
    spark.internalCreateDataFrame(batch.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftDeltaStreamSource[${log.tablePath}]"
}
