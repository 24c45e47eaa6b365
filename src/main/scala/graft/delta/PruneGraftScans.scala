package graft.delta

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Plan-time scan re-scoping: fold a `Filter`'s prunable conjuncts into the
  * [[GraftFileIndex]] itself, so the relation's `sizeInBytes` — the number
  * the join planner compares against `autoBroadcastJoinThreshold` — reflects
  * the files the scan will actually read, not the whole table.
  *
  * Spark's own `PruneFileSourcePartitions` does exactly this, but only for
  * `CatalogFileIndex`-backed scans; a custom `FileIndex` is invisible to it.
  * Without this rule a Delta scan of one partition out of a thousand still
  * advertises the full-table size and a perfectly broadcastable join side
  * gets shuffle-planned — at 100 TB that's the difference between a
  * broadcast and a multi-TB shuffle. Runtime semantics are unchanged (the
  * `Filter` stays in place; `listFiles` would prune the same set later) —
  * only the *statistics* move to plan time.
  *
  * The reference's analog is pre-scan file pruning feeding its
  * `statistics()` (`rust/src/delta.rs:733-766`,
  * `rust/src/delta_datafusion.rs:117-209`).
  *
  * Idempotence for the fixed-point optimizer batch: rewrite only when the
  * prune strictly shrinks the file set.
  */
object PruneGraftScans extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.planRewrites.enabled", "true").toBoolean) plan
    else plan.transformDown {
      case f @ Filter(_, lr: LogicalRelation) =>
        rescope(f, lr).getOrElse(f)
    }

  private def rescope(f: Filter, lr: LogicalRelation): Option[LogicalPlan] =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location match {
          case idx: GraftFileIndex =>
            // subqueries are not yet planned at this optimizer phase —
            // eval'ing one inside pruneFiles throws and kills a valid
            // query (r11 review; Spark's PruneFileSourcePartitions makes
            // the same exclusion)
            val conjuncts = splitConjuncts(f.condition).filter(e =>
              e.deterministic &&
                !org.apache.spark.sql.catalyst.expressions.SubqueryExpression
                  .hasSubquery(e))
            if (conjuncts.isEmpty) return None
            val partCols = idx.partitionSchema.fieldNames.toSet
            val (partFilters, dataFilters) = conjuncts.partition(e =>
              e.references.nonEmpty && e.references.forall(a => partCols.contains(a.name)))
            // ONE base listing: prune it and shrink-test against it — two
            // separate idx calls doubled the live-log listing and could
            // straddle a concurrent commit (r11 review)
            val base = idx.statsFiles
            val pruned = idx.pruneFiles(partFilters, dataFilters, base)
            if (pruned.size >= base.size) None
            else {
              val newIndex = new GraftFileIndex(idx.spark, idx.log, idx.snapshot, Some(pruned))
              val newRel = fs.copy(location = newIndex)(fs.sparkSession)
              // Catalog stats (if attached) must shrink with the scan, or a
              // stale full-table rowCount/size would override the pruned
              // relation size in computeStats.
              val newCatalog = lr.catalogTable.map(ct => ct.copy(stats = Some(
                RelationStats.pruned(pruned, fs.sparkSession.sessionState.conf))))
              Some(f.copy(child = lr.copy(relation = newRel, catalogTable = newCatalog)))
            }
          case _ => None
        }
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
