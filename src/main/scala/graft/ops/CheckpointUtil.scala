package graft.ops

import org.apache.spark.sql.DataFrame

/** Eagerly release an eager localCheckpoint's pinned blocks —
  * ContextCleaner is GC-driven, which on a big driver heap can be never.
  * Best-effort; shared by every iterative op that truncates lineage per
  * round (label propagation, k-means). */
private[ops] object CheckpointUtil {
  def drop(df: DataFrame): Unit =
    try df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    } catch { case _: Throwable => () }
}
