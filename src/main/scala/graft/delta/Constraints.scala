package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-path invariants: schema `NOT NULL` nullability plus CHECK
  * constraints stored as `delta.constraints.<name>` table properties (the
  * Delta protocol convention, so foreign readers see the declaration too).
  *
  * Enforcement is a guard expression folded INTO the write job — each row
  * evaluates `assert_true` over every constraint while it streams to
  * parquet, so validation costs zero extra passes and a violation aborts
  * the job before anything commits (staged files are discarded; the table
  * never observes a half-write). SQL semantics: a CHECK passes on TRUE and
  * NULL, fails only on FALSE.
  */
object Constraints {

  val Prefix = "delta.constraints."

  /** Declared CHECK constraints, `(name, sql)`, name-sorted. */
  def of(snap: Snapshot): Seq[(String, String)] =
    TableConfig.of(snap).collect {
      case (k, v) if k.startsWith(Prefix) => (k.stripPrefix(Prefix), v)
    }.toSeq.sortBy(_._1)

  /** Wrap `df` so the write job verifies every row against the table's
    * invariants. Identity when the table declares none. */
  def enforce(df: DataFrame, snap: Snapshot): DataFrame = {
    if (snap.version < 0) return df
    val notNull = snap.schema.fields.filterNot(_.nullable).map(_.name)
      .filter(df.columns.contains).toSeq
    val checks: Seq[(String, Column)] =
      notNull.map(c => (s"NOT NULL $c", col(c).isNotNull)) ++
        of(snap).map { case (n, sql) =>
          (s"CHECK $n ($sql)", coalesce(expr(sql).cast("boolean"), lit(true)))
        }
    if (checks.isEmpty) df
    else df.filter(checks.map { case (name, cond) =>
      coalesce(assert_true(cond, lit(s"constraint violated: $name")), lit(true))
    }.reduce(_ && _))
  }
}
