package graft.delta

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Optimizer rule answering stats-only aggregates from the Delta log — the
  * Spark realization of the reference's `statistics()` fast path
  * (`rust/src/delta_datafusion.rs:117-209`, exercised by
  * `rust/tests/datafusion_test.rs:57-117` where `SELECT max(v), min(v)` is
  * served from per-file Add stats without scanning data).
  *
  * A global `Aggregate` of only `min`/`max`/`count` directly over a
  * [[GraftFileIndex]]-backed scan (no intervening filter) rewrites to a
  * [[LocalRelation]] holding the answer merged from file stats. Guards:
  *
  *  - stats must be complete over the scan's file set (else bail);
  *  - `count(col)` needs that column's nullCount;
  *  - min/max limited to numeric/boolean/date columns — parquet writers may
  *    legally truncate string bounds, which are valid for *pruning* but not
  *    as exact answers;
  *  - no DISTINCT, no FILTER clauses.
  *
  * Enable per session with
  * `spark.experimental.extraOptimizations ++= Seq(StatsOnlyAggregates)` or
  * globally via `spark.sql.extensions=graft.delta.GraftSparkExtensions`.
  */
object StatsOnlyAggregates extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.planRewrites.enabled", "true").toBoolean) plan
    else plan.transformDown {
      case agg @ Aggregate(Nil, _, ScanOverIndex(index), _) =>
        tryRewrite(agg, index).getOrElse(agg)
    }

  /** Matches the scan (optionally under an attribute-only Project). */
  private object ScanOverIndex {
    def unapply(p: LogicalPlan): Option[GraftFileIndex] = p match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case idx: GraftFileIndex => Some(idx)
          case _ => None
        }
        case _ => None
      }
      case Project(projs, child) if projs.forall(_.isInstanceOf[AttributeReference]) =>
        unapply(child)
      case _ => None
    }
  }

  private def statValue(n: JsonNode, dt: DataType): Option[Any] = dt match {
    case LongType if n.isNumber    => Some(n.asLong)
    case IntegerType if n.isNumber => Some(n.asInt)
    case ShortType if n.isNumber   => Some(n.asInt.toShort)
    case ByteType if n.isNumber    => Some(n.asInt.toByte)
    case DoubleType if n.isNumber  => Some(n.asDouble)
    case FloatType if n.isNumber   => Some(n.asDouble.toFloat)
    case BooleanType if n.isBoolean => Some(n.asBoolean)
    case DateType if n.isTextual =>
      scala.util.Try(java.time.LocalDate.parse(n.asText).toEpochDay.toInt).toOption
    case _ => None // strings excluded: footer bounds may be truncated
  }

  private def tryRewrite(agg: Aggregate, index: GraftFileIndex): Option[LogicalPlan] = {
    val stats = TableStatistics.of(index.statsFiles)
    val numRecords = stats.numRecords match {
      case Some(n) => n
      case None => return None // incomplete stats: never rewrite
    }

    def answer(ne: NamedExpression): Option[Any] = ne match {
      case Alias(ae: AggregateExpression, _) => answer0(ae)
      case ae: AggregateExpression => answer0(ae)
      case _ => None
    }
    def answer0(ae: AggregateExpression): Option[Any] = {
      if (ae.isDistinct || ae.filter.isDefined || ae.mode != Complete) return None
      ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) => Some(numRecords)
        case Count(Seq(a: AttributeReference)) =>
          stats.nullCounts.get(a.name).map(numRecords - _)
        case Min(a: AttributeReference) =>
          stats.minValues.get(a.name).flatMap(statValue(_, a.dataType))
        case Max(a: AttributeReference) =>
          stats.maxValues.get(a.name).flatMap(statValue(_, a.dataType))
        case _ => None
      }
    }

    val values = agg.aggregateExpressions.map(answer)
    if (values.exists(_.isEmpty)) return None

    // all-stats answer: emit a one-row LocalRelation with the agg's output
    val output = agg.aggregateExpressions.map(_.toAttribute)
    val row = InternalRow.fromSeq(values.map(_.get))
    val unsafe = UnsafeProjection.create(output.map(_.dataType).toArray)(row).copy()
    Some(LocalRelation(output, Seq(unsafe)))
  }
}

/** `spark.sql.extensions` entry point registering [[StatsOnlyAggregates]]
  * and [[PruneGraftScans]]. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => StatsOnlyAggregates)
    extensions.injectOptimizerRule(_ => PruneGraftScans)
    extensions.injectResolutionRule(session => new GraftV2Fallback(session))
    extensions.injectResolutionRule(session => new ApplyDeletionVectors(session))
    extensions.injectPostHocResolutionRule(_ => GraftDeltaInserts)
    extensions.injectHintResolutionRule(session => new GraftSqlDml(session))
    extensions.injectTableFunction(GraftHistoryFunction.descriptor)
    extensions.injectTableFunction(GraftDetailFunction.descriptor)
    extensions.injectTableFunction(GraftChangesFunction.descriptor)
    extensions.injectTableFunction(GraftTableChangesFunction.descriptor)
  }
}
