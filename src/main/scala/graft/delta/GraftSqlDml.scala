package graft.delta

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** SQL `DELETE FROM` / `UPDATE` / `MERGE INTO` over graft-delta catalog
  * tables, routed to the engine's copy-on-write DML ([[Dml]], [[Merge]]).
  *
  * Spark only supports these statements against DataSource-V2 catalogs —
  * `ResolveSessionCatalog` rejects a V1 table with UNSUPPORTED_FEATURE
  * before any injected resolution rule can run (the Resolution batch throws
  * mid-iteration). So this rule is injected into the **Hints** batch, which
  * the analyzer runs before Resolution: it sees the freshly parsed
  * `DeleteFromTable`/`UpdateTable`/`MergeIntoTable` nodes, resolves the
  * target name against the session catalog itself, and — only when the
  * provider is graft-delta — swaps the statement for a runnable command.
  * Conditions and assignment values are kept as unresolved expressions and
  * resolve naturally against the table scan (or merge join) inside the
  * command, after alias qualifiers are remapped (`DELETE FROM tbl x WHERE
  * x.id…` → bare `id`; merge aliases → the engine's `t`/`s`).
  *
  * Each command returns `num_affected_rows`, and every mutation is one
  * optimistic log commit with the usual conflict checks.
  */
final class GraftSqlDml(spark: SparkSession) extends Rule[LogicalPlan] {

  import GraftSqlDml.{InsertClause, MatchedClause, MatchedDelete, MatchedUpdate, MatchedUpdateStar}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    // SQL time travel (`VERSION AS OF` / `TIMESTAMP AS OF`) — DSv2-only in
    // stock Spark; for graft tables the pinned relation is resolved right
    // here and returned as an ordinary LogicalRelation leaf
    // inner match, not a guard: the guard-then-get shape ran the full
    // tableExists + getTableMetadata RPC pair twice per node (r11 review)
    case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
      GraftTarget.unapply(tt.relation) match {
        case None => tt
        case Some((path, _)) =>
          val table = (tt.version, tt.timestamp) match {
            case (Some(v), _) => DeltaTable.forPath(spark, path, v.toLong)
            case (None, Some(ts)) =>
              require(ts.foldable, "TIMESTAMP AS OF requires a constant expression")
              val micros = org.apache.spark.sql.catalyst.expressions.Cast(
                ts, org.apache.spark.sql.types.TimestampType,
                Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
              require(micros != null, s"invalid TIMESTAMP AS OF expression: ${ts.sql}")
              DeltaTable.forPathAsOf(spark, path, micros.asInstanceOf[Long] / 1000L)
            case _ => throw new IllegalArgumentException(
              "time travel needs VERSION AS OF or TIMESTAMP AS OF")
          }
          val index = new GraftFileIndex(spark, table.log, table.snapshot)
          org.apache.spark.sql.execution.datasources.LogicalRelation(
            new GraftDeltaRelation(index, timeTravel = true, spark), false)
      }

    // conditions/assignments are converted to opaque Columns here: a command
    // must not expose unresolved Expressions through its constructor fields
    // or checkAnalysis rejects it before run() can resolve them itself
    case DeleteFromTable(GraftTarget(path, quals), condition) =>
      GraftSqlDeleteCommand(path, colOf(stripQuals(condition, quals)))

    case UpdateTable(GraftTarget(path, quals), assignments, condition) =>
      GraftSqlUpdateCommand(path,
        assignments.map(a => (assignName(a.key, quals), colOf(stripQuals(a.value, quals)))),
        condition.map(c => colOf(stripQuals(c, quals))))

    case m @ MergeIntoTable(GraftTarget(path, tQuals), _, _, _, _, _, _) =>
      // an UNALIASED source (MERGE ... USING src ON tgt.id = src.id) keeps
      // its table-name qualifier on every reference — it must remap to the
      // engine's `s` alias exactly like an explicit alias does (r11
      // review: sAlias was empty there and the merge failed analysis)
      val sAlias = m.sourceTable match {
        case SubqueryAlias(ident, _) => Set(ident.name)
        case u: UnresolvedRelation =>
          Set(u.multipartIdentifier.last, u.multipartIdentifier.mkString("."))
        case _ => Set.empty[String]
      }
      // strip the leading qualifier parts, KEEPING any nested-field tail —
      // collapsing x.info.id to t.id silently redirected struct references
      // to a same-named top-level column (r11 review)
      def strip(parts: Seq[String], quals: Set[String]): Seq[String] = {
        var p = parts
        while (p.size > 1 && quals.contains(p.head)) p = p.tail
        p
      }
      // remap user aliases onto the engine's canonical t/s aliases
      def requalify(e: Expression): Column = colOf(e.transformUp {
        case a: UnresolvedAttribute if a.nameParts.size > 1 =>
          val t = strip(a.nameParts, tQuals)
          lazy val s = strip(a.nameParts, sAlias)
          if (!(t eq a.nameParts)) UnresolvedAttribute("t" +: t)
          else if (!(s eq a.nameParts)) UnresolvedAttribute("s" +: s)
          else a
      })
      def cond(c: Option[Expression]): Column =
        c.map(requalify).getOrElse(org.apache.spark.sql.functions.lit(true))
      def assigns(as: Seq[Assignment]): Map[String, Column] =
        as.map(a => assignName(a.key, tQuals) -> requalify(a.value)).toMap
      val matched: Seq[MatchedClause] = m.matchedActions.map {
        case u: UpdateAction     => MatchedUpdate(cond(u.condition), assigns(u.assignments))
        case u: UpdateStarAction => MatchedUpdateStar(cond(u.condition))
        case d: DeleteAction     => MatchedDelete(cond(d.condition))
        case other => throw new IllegalArgumentException(
          s"graft-delta MERGE: unsupported matched action $other")
      }
      val inserts: Seq[InsertClause] = m.notMatchedActions.map {
        case i: InsertAction     => InsertClause(cond(i.condition), Some(assigns(i.assignments)))
        case i: InsertStarAction => InsertClause(cond(i.condition), None)
        case other => throw new IllegalArgumentException(
          s"graft-delta MERGE: unsupported not-matched action $other")
      }
      val bySource: Seq[MatchedClause] = m.notMatchedBySourceActions.map {
        case u: UpdateAction => MatchedUpdate(cond(u.condition), assigns(u.assignments))
        case d: DeleteAction => MatchedDelete(cond(d.condition))
        case other => throw new IllegalArgumentException(
          s"graft-delta MERGE: unsupported not-matched-by-source action $other")
      }
      GraftSqlMergeCommand(path, m.sourceTable, requalify(m.mergeCondition),
        matched, inserts, bySource)
  }

  private def colOf(e: Expression): Column = ColumnBridge.column(e)

  /** Assignment-key column name with the table/alias qualifier stripped.
    * Nested-field targets refuse LOUDLY (r11 review): the old last-name
    * collapse turned `SET addr.city = …` into an assignment to a
    * top-level `city` column — a silent wrong-column write when one
    * exists. Assign the whole struct instead. */
  private def assignName(e: Expression, quals: Set[String]): String = e match {
    case a: UnresolvedAttribute =>
      var parts = a.nameParts
      while (parts.size > 1 && quals.contains(parts.head)) parts = parts.tail
      if (parts.size > 1) throw new IllegalArgumentException(
        s"graft-delta DML: nested-field assignment '${a.name}' is not " +
        "supported — assign the whole struct column")
      parts.head
    case other => other.sql
  }

  /** Drop leading qualifier parts naming the table/alias so the predicate
    * resolves against a bare table scan. */
  private def stripQuals(e: Expression, quals: Set[String]): Expression =
    e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.size > 1 =>
        var parts = a.nameParts
        while (parts.size > 1 && quals.contains(parts.head)) parts = parts.tail
        if (parts eq a.nameParts) a else UnresolvedAttribute(parts)
    }

  /** Matches a DML target that is a graft-delta catalog table; yields the
    * table path and the qualifier names (alias, table, db, catalog) that may
    * prefix column references. */
  private object GraftTarget {
    def unapply(p: LogicalPlan): Option[(String, Set[String])] = p match {
      case SubqueryAlias(ident, child) =>
        unapply(child).map { case (path, quals) => (path, quals + ident.name) }
      case u: UnresolvedRelation => lookup(u.multipartIdentifier)
      case _ => None
    }

    private def lookup(nameParts: Seq[String]): Option[(String, Set[String])] = {
      val ident = nameParts match {
        case Seq(t) => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
        case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
          TableIdentifier(t, Some(db))
        case _ => return None
      }
      try {
        val catalog = spark.sessionState.catalog
        // a temp view shadowing the table name must win, exactly as it
        // does for reads — matching the catalog table here would mutate
        // the PHYSICAL table behind the user's view (r11 review)
        if (catalog.isTempView(nameParts)) return None
        if (!catalog.tableExists(ident)) return None
        val meta = catalog.getTableMetadata(ident)
        if (!meta.provider.exists(_.equalsIgnoreCase("graft-delta"))) return None
        // full URI string, not getPath: stripping scheme/authority would
        // resolve s3a://bucket/tbl to /tbl on the DEFAULT filesystem (r11)
        val path = meta.storage.properties.get("path")
          .orElse(meta.storage.locationUri.map(u =>
            new org.apache.hadoop.fs.Path(u).toString))
        path.map((_, nameParts.toSet + ident.table))
      } catch { case _: Exception => None }
    }
  }
}

private[delta] object GraftSqlDml {
  val affectedRows: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())

  sealed trait MatchedClause
  final case class MatchedUpdate(cond: Column, set: Map[String, Column]) extends MatchedClause
  final case class MatchedUpdateStar(cond: Column) extends MatchedClause
  final case class MatchedDelete(cond: Column) extends MatchedClause
  /** `values = None` ⇒ INSERT * (all target columns from same-named source). */
  final case class InsertClause(cond: Column, values: Option[Map[String, Column]])
}

final case class GraftSqlDeleteCommand(path: String, condition: Column)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.affectedRows
  override def run(session: SparkSession): Seq[Row] = {
    val m = Dml.delete(session, path, condition)
    Seq(Row(m.rowsAffected))
  }
}

final case class GraftSqlUpdateCommand(path: String,
    assignments: Seq[(String, Column)], condition: Option[Column])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.affectedRows
  override def run(session: SparkSession): Seq[Row] = {
    val cond = condition.getOrElse(org.apache.spark.sql.functions.lit(true))
    val m = Dml.update(session, path, cond, assignments.toMap)
    Seq(Row(m.rowsAffected))
  }
}

final case class GraftSqlMergeCommand(path: String, source: LogicalPlan,
    condition: Column, matchedClauses: Seq[GraftSqlDml.MatchedClause],
    insertClauses: Seq[GraftSqlDml.InsertClause],
    bySourceClauses: Seq[GraftSqlDml.MatchedClause] = Nil)
  extends LeafRunnableCommand {
  import GraftSqlDml._

  override val output: Seq[Attribute] = GraftSqlDml.affectedRows
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val sourceDf = ColumnBridge.ofRows(session, source)
    val schema = DeltaTable.forPath(session, path).schema
    def starSet: Map[String, Column] = schema.fieldNames.map(f =>
      f -> org.apache.spark.sql.functions.col(s"s.`$f`")).toMap

    var b = Merge.into(session, path, sourceDf, condition)
    // the builder applies clauses first-matching-wins in declaration order —
    // exactly SQL MERGE's semantics — so clauses pass through unmodified
    matchedClauses.foreach {
      case MatchedUpdate(c, set)  => b = b.whenMatchedUpdate(c, set)
      case MatchedUpdateStar(c)   => b = b.whenMatchedUpdate(c, starSet)
      case MatchedDelete(c)       => b = b.whenMatchedDelete(c)
    }
    insertClauses.foreach {
      case InsertClause(c, Some(values)) => b = b.whenNotMatchedInsert(c, values)
      case InsertClause(c, None)         => b = b.whenNotMatchedInsert(c, starSet)
    }
    bySourceClauses.foreach {
      case MatchedUpdate(c, set) => b = b.whenNotMatchedBySourceUpdate(c, set)
      case MatchedDelete(c)      => b = b.whenNotMatchedBySourceDelete(c)
      case MatchedUpdateStar(_) => throw new IllegalArgumentException(
        "UPDATE SET * is undefined for NOT MATCHED BY SOURCE (no source row)")
    }
    val m = b.execute()
    Seq(Row(m.rowsUpdated + m.rowsDeleted + m.rowsInserted))
  }
}
