package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured-Streaming operator wrappers for the event-pipeline surface:
  * watermarked tumbling/sliding windows, session windows, and custom
  * keyed state via `mapGroupsWithState`.
  *
  * The reference has no execution-level streaming (only the `txn`/
  * `StreamingUpdate` protocol support — see [[GraftStreamSink]]); these are
  * north-star operators expressed purely with Spark's built-in stateful
  * machinery, so watermark handling, state store management, and late-data
  * semantics are Spark's own. Works identically on batch DataFrames (window
  * functions degrade gracefully), which is how the DuckDB oracle checks the
  * batch shape (q31).
  */
object StreamOps {

  /** Watermarked tumbling (or sliding, when `slide` is given) window
    * aggregation: count + sum per (window, keys). */
  def windowedAgg(df: DataFrame, tsCol: String, watermarkDelay: String,
                  windowDuration: String, slide: Option[String] = None,
                  keys: Seq[String] = Nil, valueCol: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), windowDuration, s)
      case None => window(col(tsCol), windowDuration)
    }
    val groupCols: Seq[Column] = w +: keys.map(col)
    val aggs: Seq[Column] = count(lit(1)).as("n") +:
      valueCol.map(v => sum(col(v)).as("sum_value")).toSeq
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Session windows: events within `gap` of each other per key share a
    * session; emits one row per closed session with its span and count. */
  def sessionize(df: DataFrame, tsCol: String, watermarkDelay: String,
                 gap: String, keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy((session_window(col(tsCol), gap) +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .select(keys.map(col) ++ Seq(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n")): _*)

  /** Streaming exact dedup: keeps the FIRST event per key across
    * micro-batches, with state bounded by the watermark — the only shape
    * that survives an unbounded stream (an unbounded seen-keys set would
    * eventually evict or OOM; here a key's state expires once the
    * watermark passes it, so a duplicate arriving later than
    * `watermarkDelay` is the documented trade, not a crash).
    * `dropDuplicatesWithinWatermark` is Spark's native operator for
    * exactly this; the wrapper fixes the watermark-column pairing. */
  def streamingDedup(df: DataFrame, tsCol: String, watermarkDelay: String,
                     keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Custom keyed running state via `mapGroupsWithState`: maintains a
    * per-key (count, sum) accumulator across micro-batches and emits the
    * running value each batch — the template for bespoke state the built-in
    * aggregations can't express. */
  final case class RunningStat(key: String, n: Long, total: Double)

  def runningStats[K](ds: Dataset[(String, Double)])(
      implicit e1: Encoder[RunningStat]): Dataset[RunningStat] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), RunningStat](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          RunningStat(key, n, s)
      }
  }
}
