package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-path invariants: schema `NOT NULL` nullability, CHECK constraints
  * stored as `delta.constraints.<name>` table properties, per-column
  * invariants (the legacy writer-2 field-metadata form `delta.invariants`)
  * and generated columns (`delta.generationExpression` field metadata) —
  * all the Delta protocol conventions, so foreign readers see the same
  * declarations.
  *
  * Enforcement is a guard expression folded INTO the write job — each row
  * evaluates `assert_true` over every constraint while it streams to
  * parquet, so validation costs zero extra passes and a violation aborts
  * the job before anything commits (staged files are discarded; the table
  * never observes a half-write). SQL semantics: a CHECK/invariant passes on
  * TRUE and NULL, fails only on FALSE; a generated column must null-safely
  * equal its expression (an UPDATE that changes a source column without
  * refreshing the generated one aborts loudly rather than committing a
  * stale derivation).
  */
object Constraints {

  val Prefix = "delta.constraints."

  /** Field-metadata key of the legacy per-column invariant, holding
    * `{"expression":{"expression":"<sql>"}}` (delta-spark's shape). */
  val InvariantKey = "delta.invariants"

  /** Field-metadata key of a generated column's SQL expression. */
  val GenerationKey = "delta.generationExpression"

  /** Declared CHECK constraints, `(name, sql)`, name-sorted. */
  def of(snap: Snapshot): Seq[(String, String)] = ofConfig(TableConfig.of(snap))

  def ofConfig(config: Map[String, String]): Seq[(String, String)] =
    config.collect {
      case (k, v) if k.startsWith(Prefix) => (k.stripPrefix(Prefix), v)
    }.toSeq.sortBy(_._1)

  /** Per-column invariants of the schema, `(column, sql)`. Tolerant of the
    * raw-SQL form some writers emit (a plain string instead of the nested
    * JSON object). */
  def invariantsOf(schema: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
    schema.fields.toSeq.filter(_.metadata.contains(InvariantKey)).flatMap { f =>
      val raw = f.metadata.getString(InvariantKey)
      val sql =
        try {
          val node = ActionCodec.mapper.readTree(raw)
          val nested = node.path("expression").path("expression")
          if (nested.isTextual) nested.asText else raw
        } catch { case _: Exception => raw }
      if (sql.trim.nonEmpty) Some(f.name -> sql) else None
    }

  /** Generated columns of the schema, `(column, sql)`. */
  def generatedOf(schema: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
    schema.fields.toSeq.filter(_.metadata.contains(GenerationKey))
      .map(f => f.name -> f.metadata.getString(GenerationKey))

  /** Fill in generated columns the incoming frame omits (delta-spark write
    * semantics: omitting a generated column means "compute it"); values the
    * caller DOES provide are verified per-row by [[enforce]] instead. */
  def withGenerated(df: DataFrame, snap: Snapshot): DataFrame = {
    if (snap.version < 0) return df
    val missing = generatedOf(snap.schema).filterNot(g => df.columns.contains(g._1))
    if (missing.isEmpty) return df
    val filled = missing.foldLeft(df) { case (d, (c, sql)) =>
      d.withColumn(c, expr(sql).cast(snap.schema(c).dataType))
    }
    // restore the table's declared column order (the exact-schema check is
    // positional); columns the table does not know keep their tail spots
    val tableOrder = snap.schema.fieldNames.filter(filled.columns.contains)
    val extras = filled.columns.filterNot(tableOrder.contains)
    filled.select((tableOrder ++ extras).map(c => filled.col(s"`$c`")).toSeq: _*)
  }

  /** Recompute generated columns after a row-transforming DML (UPDATE /
    * MERGE update clauses): the derivation must follow the NEW source
    * values. Unconditionally recomputing is sound — rows the DML did not
    * touch re-derive the value they already hold (the table was
    * consistent), and [[enforce]] verifies explicitly-assigned ones.
    * `explicit` columns (user-assigned) are left to that verification. */
  def regenerate(df: DataFrame, snap: Snapshot,
                 explicit: Set[String] = Set.empty): DataFrame = {
    if (snap.version < 0) return df
    val lower = explicit.map(_.toLowerCase(java.util.Locale.ROOT))
    generatedOf(snap.schema)
      .filterNot(g => lower.contains(g._1.toLowerCase(java.util.Locale.ROOT)))
      .filter(g => df.columns.contains(g._1))
      .foldLeft(df) { case (d, (c, sql)) =>
        d.withColumn(c, expr(sql).cast(snap.schema(c).dataType))
      }
  }

  /** Wrap `df` so the write job verifies every row against the table's
    * invariants. Identity when the table declares none. */
  def enforce(df: DataFrame, snap: Snapshot): DataFrame =
    if (snap.version < 0) df
    else enforceAgainst(df, snap.schema, TableConfig.of(snap))

  /** As [[enforce]], against an explicit (schema, configuration) pair —
    * the pair a schema-replacing overwrite is COMMITTING rather than the
    * one it replaces (r12 review: a replace that carried the old
    * configuration forward shipped data unvalidated against CHECK
    * constraints that remained declared on the table). */
  def enforceAgainst(df: DataFrame,
                     schema: org.apache.spark.sql.types.StructType,
                     config: Map[String, String]): DataFrame = {
    // NOT NULL at EVERY nesting level (r11 review — top-level-only let a
    // null addr.city through a declared-non-nullable nested field): a
    // nested check applies only where the parent itself is present, so
    // the condition is parent-null-guarded at each step. Backtick-quoted
    // throughout — a dotted column name must not parse as a field path.
    def q(n: String) = DeltaSchema.quoted(n)
    def notNullPaths(fields: Seq[org.apache.spark.sql.types.StructField],
                     prefix: Option[(String, Column)]): Seq[(String, Column)] =
      fields.flatMap { f =>
        val path = prefix.map(_._1 + "." + f.name).getOrElse(f.name)
        val c = prefix.map(_._2.getField(f.name)).getOrElse(col(q(f.name)))
        val here =
          if (f.nullable) Nil
          else {
            val cond = prefix match {
              case Some((_, parent)) => parent.isNull || c.isNotNull
              case None => c.isNotNull
            }
            Seq((s"NOT NULL $path", cond))
          }
        here ++ (f.dataType match {
          case s: org.apache.spark.sql.types.StructType =>
            notNullPaths(s.fields.toSeq, Some((path, c)))
          case _ => Nil
        })
      }
    val declaredChecks = ofConfig(config)
    val notNull = notNullPaths(
      schema.fields.toSeq.filter(f => df.columns.contains(f.name)), None)
    val checks: Seq[(String, Column)] =
      notNull ++
        declaredChecks.map { case (n, sql) =>
          (s"CHECK $n ($sql)", coalesce(expr(sql).cast("boolean"), lit(true)))
        } ++
        invariantsOf(schema).filter(i => df.columns.contains(i._1))
          .map { case (c, sql) =>
            (s"INVARIANT $c ($sql)", coalesce(expr(sql).cast("boolean"), lit(true)))
          } ++
        generatedOf(schema).filter(g => df.columns.contains(g._1))
          .map { case (c, sql) =>
            (s"GENERATED $c AS ($sql)",
              col(q(c)) <=> expr(sql).cast(schema(c).dataType))
          }
    if (checks.isEmpty) df
    else df.filter(checks.map { case (name, cond) =>
      coalesce(assert_true(cond, lit(s"constraint violated: $name")), lit(true))
    }.reduce(_ && _))
  }
}
