package graft.delta

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, OverwritePartitionsDynamic, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.delta.catalog.GraftTable

/** Resolution rule converting every `DataSourceV2Relation` over a
  * [[graft.delta.catalog.GraftTable]] into the engine's V1 scan — the
  * `DeltaAnalysis` fallback pattern: the catalog resolves names to a v2
  * handle (which is what routes DDL through [[graft.delta.catalog.GraftCatalog]]),
  * while scans stay on [[GraftFileIndex]] with partition pruning, stats
  * skipping and the plan-time rewrites ([[StatsOnlyAggregates]],
  * [[PruneGraftScans]]) that match on `LogicalRelation`.
  *
  * Relations that are the TARGET of a v2 write (`AppendData` /
  * `OverwriteByExpression` / `OverwritePartitionsDynamic`, i.e. INSERT and
  * CTAS) are left v2: their write planning goes through the table's
  * `V1_BATCH_WRITE` funnel, which commits through the same transaction
  * path. Only read-side relations convert. */
final class GraftV2Fallback(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // v2 write commands reference their target relation's attributes; the
    // relation must stay v2 there (the V1Write funnel handles execution)
    val writeTargets = plan.collect {
      case w: V2WriteCommand => w.table
    }.toSet[Any]

    plan.resolveOperatorsDown {
      // v2 dynamic partition overwrite has no V1Write fallback in Spark's
      // planner; reroute it to the V1 INSERT OVERWRITE statement, which the
      // engine's DataSourceAnalysis swap (GraftDeltaInserts) commits with
      // only-touched-partitions semantics under the same session conf that
      // made Spark choose dynamic mode in the first place
      case OverwritePartitionsDynamic(
            dsr @ DataSourceV2Relation(_: GraftTable, _, _, _, _, _), query, _, isByName, _) =>
        InsertIntoStatement(toV1Relation(dsr), Map.empty, Nil, query,
          overwrite = true, ifPartitionNotExists = false, byName = isByName)

      case dsr @ DataSourceV2Relation(_: GraftTable, _, _, _, _, _)
          if !writeTargets.contains(dsr) =>
        toV1Relation(dsr)
    }
  }

  private def toV1Relation(dsr: DataSourceV2Relation): LogicalPlan = {
    val gt = dsr.table.asInstanceOf[GraftTable]
    val asOf: Map[String, String] = dsr.timeTravelSpec match {
      case Some(tt) => org.apache.spark.sql.graftbridge.CatalogBridge.timeTravelOptions(tt)
      case None => Map.empty
    }
    val params = gt.options ++ dsr.options.asCaseSensitiveMap().asScala ++
      asOf + (GraftDeltaSource.MappedReadKey -> "true")
    val rel = new GraftDeltaSource()
      .createRelation(session.sqlContext, params)
      .asInstanceOf[GraftDeltaRelation]
    val index = rel.location.asInstanceOf[GraftFileIndex]
    if (ColumnMapping.isMapped(index.snapshot)) {
      // the relation's output is the PHYSICAL schema; project it back to
      // the v2 relation's logical attributes (exprIds preserved — parents
      // reference them). Mirror of DeltaTable's scan projection: nested
      // renames ride a same-shape struct cast, primitives alias directly.
      val physOutput = rel.schema.fields.toSeq.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable, f.metadata)())
      val byPhys = physOutput.map(a => a.name -> a).toMap
      val lr = LogicalRelation(rel, physOutput,
        Some(RelationStats.catalogTable(index.log, index.snapshot, rel.schema)),
        false, None)
      val logicalFields = index.snapshot.schema.fields.map(f => f.name -> f).toMap
      val aliases = dsr.output.map { a =>
        val f = logicalFields(a.name)
        val phys = byPhys(ColumnMapping.physicalFieldName(f))
        val child: Expression =
          if (phys.dataType == f.dataType) phys else Cast(phys, f.dataType)
        Alias(child, f.name)(exprId = a.exprId, qualifier = a.qualifier)
      }
      return Project(aliases, lr)
    }
    // reuse the v2 relation's attributes (parents reference their exprIds),
    // reordered to the V1 relation's data++partition layout
    val byName = dsr.output.map(a => a.name -> a).toMap
    val v1Output = rel.schema.fields.toSeq.map(f => byName(f.name))
    val lr = LogicalRelation(rel, v1Output,
      Some(RelationStats.catalogTable(index.log, index.snapshot, rel.schema)),
      false, None)
    if (v1Output == dsr.output) lr else Project(dsr.output, lr)
  }
}
