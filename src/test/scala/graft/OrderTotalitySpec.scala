package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Sort}
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic-row-order guard for every gate query.
  *
  * The driver's hash compare is ROW-ORDER sensitive, and the synthetic
  * lineitem has ~118k duplicate (l_orderkey, l_linenumber) keys at sf0.1 —
  * so an ORDER BY over those two columns alone is NOT a total order, and
  * tied rows come back in engine-dependent order. That exact bug shipped in
  * q2/q4 for seven rounds: it hash-matched at sf0.001–sf0.1 because both
  * engines happened to scan the single small parquet file in the same
  * stable order, and diverged the first time the round-8 sf1 sweep gave
  * Spark a multi-split scan. This spec makes the property mechanical: a
  * future query (or a dropped tie-break in an existing one) that relies on
  * luck fails here, on the smallest testdata, in CI.
  *
  * A query's global Sort guarantees deterministic output order when any of:
  *  1. its sort keys cover EVERY output column (ties are identical rows);
  *  2. its sort keys include a key that is unique in the source data
  *     (verified against the testdata by UniquenessSpec-style checks in
  *     scripts/make_sf1.py's design notes: every table except lineitem has
  *     a unique primary key);
  *  3. its sort keys include both id_a and id_b (pair outputs are unique
  *     on the unordered pair by construction: id_a < id_b);
  *  4. the plan aggregates and the sort keys cover that aggregate's full
  *     grouping key (result rows are unique on the group key);
  *  5. the plan can produce at most one row (global aggregates).
  */
class OrderTotalitySpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** Columns unique per source row in the driver-generated testdata (every
    * table except lineitem; lineitem's (okey, line) is deliberately NOT
    * here — it is non-unique, the whole point of this spec). */
  private val uniqueKeys = Set(
    "o_orderkey", "c_custkey", "s_suppkey", "p_partkey",
    "doc_id", "vec_id", "event_id")

  /** ROLLUP/CUBE grouping tuples are distinct only because the grouped
    * columns are never NULL in the data (a data NULL could collide with a
    * subtotal row) — not provable from the plan, so exempted with eyes
    * open. q53's `id` is unique as connectedComponents' group key, and
    * q56 is a single invariant row via crossJoin of two 1-row aggregates. */
  private val exempt = Set("q36_rollup", "q37_cube", "q53_dedup_cluster", "q56_packing")

  private def sortRefs(plan: LogicalPlan): Option[Set[String]] =
    plan.collectFirst { case s: Sort if s.global =>
      s.order.flatMap(_.references.toSeq.map(_.name)).toSet
    }

  private def deterministic(plan: LogicalPlan, out: Set[String]): Boolean =
    sortRefs(plan) match {
      case Some(keys) =>
        out.subsetOf(keys) ||
          keys.exists(uniqueKeys) ||
          (keys.contains("id_a") && keys.contains("id_b")) ||
          plan.collect { case a: Aggregate =>
            // group keys as OUTPUT names (a grouping expression may be a
            // computed column surfaced under an alias, e.g. q31's `day`)
            val outNames = a.groupingExpressions.flatMap { g =>
              a.aggregateExpressions.collectFirst {
                case al: Alias if al.child.semanticEquals(g) => al.name
                case at: Attribute if at.semanticEquals(g) => at.name
              }
            }
            (a.groupingExpressions.size, outNames)
          }.exists { case (n, outNames) =>
            n > 0 && outNames.size == n && outNames.toSet.subsetOf(keys)
          }
      case None => plan.maxRows.contains(1L)
    }

  test("every gate query's output row order is deterministic by construction") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if exempt(name) => None
      case (name, fn) =>
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.analyzed
        if (deterministic(plan, df.columns.toSet)) None
        else Some(s"$name: sort=${sortRefs(plan)} out=${df.columns.toSet}")
    }
    assert(failures.isEmpty,
      s"queries with engine-dependent tie order:\n${failures.mkString("\n")}")
  }
}
