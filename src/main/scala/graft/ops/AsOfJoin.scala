package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-aligned joins Spark's built-in operators can't express without a
  * cartesian blow-up: AS-OF (each left row picks the nearest-in-time right
  * row) and POINT-IN-INTERVAL range joins. The reference delegates its SQL
  * to a general engine and ships neither; a training-data pipeline needs
  * both constantly (align events to the latest feature snapshot, attribute
  * clicks to the preceding purchase, slice events into sessions).
  *
  * Both are SINGLE-SHUFFLE plans by construction:
  *
  *  - [[asOf]] is the union trick: tag both inputs, union them, ONE window
  *    over (keys, time) carries the latest right payload forward, left
  *    rows read it. No join node at all — Spark's own SortMergeJoin can't
  *    do inequality matching without falling back to
  *    BroadcastNestedLoopJoin (O(n·m) compare), while this is one
  *    hash-shuffle on the keys + an in-partition sort: the same cost
  *    profile as a groupBy, scale-safe at 100 TB key cardinalities.
  *  - [[rangePointJoin]] is the bucketized range join (the technique
  *    behind warehouse "range join optimization"): intervals explode to
  *    the fixed-width buckets they overlap, points map to their bucket,
  *    an EQUI-join on (keys, bucket) does the heavy lifting, and the
  *    exact containment predicate filters within buckets. Shuffle volume
  *    is O(rows + interval_width/bucket_width · intervals), never O(n·m).
  */
object AsOfJoin {

  /** For each left row, the LATEST right row (on `rightTime`, matching
    * `keyCols`) at-or-before the left row's `leftTime` — pandas
    * `merge_asof(direction="backward")`, DuckDB `ASOF JOIN ... ON l.t >=
    * r.t`. Left-outer semantics: unmatched left rows keep null right
    * columns. `strict = true` matches strictly-before (`>`), excluding
    * equal timestamps. `forward = true` flips the direction: the EARLIEST
    * right row at-or-after (`<=` / `<`).
    *
    * `rightCols` are the right columns carried into the result (must not
    * collide with left column names). Rows are carried as ONE struct
    * payload, so a null VALUE inside a matched right row is preserved —
    * it never "sees through" to an older right row. Among right rows
    * sharing (keys, time), the payload-struct max wins — total and
    * deterministic for any right side unique on (keys, time), which is
    * the contract a caller who cares about exact output should meet
    * (aggregate the right side first, as the q87 gate does).
    *
    * One shuffle (hash on `keyCols`), one in-partition sort, no join node:
    * `.explain` shows Exchange(hashpartitioning(keys)) → Sort → Window —
    * survives any scale-up the key cardinality supports. */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String, rightCols: Seq[String],
           strict: Boolean = false, forward: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "asOf needs at least one key column")
    require(rightCols.nonEmpty, "asOf needs right columns to carry")
    val collisions = rightCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right columns $collisions collide with left column names — alias " +
      "them on the right side first")
    val ts = "__graft_asof_ts"
    val side = "__graft_asof_side"
    val payload = "__graft_asof_p"
    // side ordering decides equal-timestamp visibility: the window scans
    // rows up to CURRENT, so "right sorts before left" makes an
    // equal-time right row visible (inclusive), "after" hides it (strict)
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    val l = left
      .withColumn(ts, col(leftTime))
      .withColumn(side, lit(leftSide))
      .withColumn(payload,
        lit(null).cast(right.select(rightCols.map(col): _*).schema))
    val r = right
      .withColumn(ts, col(rightTime))
      .withColumn(side, lit(rightSide))
      .withColumn(payload, struct(rightCols.map(col): _*))
      .select((keyCols ++ Seq(ts, side, payload)).map(col): _*)
    // left columns ride along; right rows carry nulls for them
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val dir: Column => Column = if (forward) _.desc else _.asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(dir(col(ts)), col(side).asc, col(payload).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col(side) === leftSide)
      .select(left.columns.map(col) ++
        rightCols.map(c => col(s"$payload.$c").as(c)): _*)
  }

  /** Inner-join left POINT rows to every right INTERVAL row containing
    * them: `left.point ∈ [right.start, right.end]` (closed bounds), plus
    * optional equi-keys. The inequality never reaches a join operator:
    * intervals explode to the `bucketWidth`-wide buckets they overlap
    * (`sequence()` — codegen'd, no UDF), points map to one bucket, and an
    * equi-join on (keys, bucket) + the exact containment filter finishes.
    *
    * All three columns must be numeric and in the SAME units (cast
    * timestamps with `unix_micros` first — the q88 gate does). Choose
    * `bucketWidth` near the TYPICAL interval length: shuffle volume grows
    * with interval_width / bucketWidth per interval row, and the guard
    * refuses a single interval exploding past `maxBucketsPerInterval`
    * (degenerate-width protection — the same philosophy as the LSH
    * bucket cap). Output: left.* ++ right.* (names must be disjoint). */
  def rangePointJoin(left: DataFrame, right: DataFrame, pointCol: String,
                     startCol: String, endCol: String, bucketWidth: Long,
                     keyCols: Seq[String] = Nil,
                     maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap =
      left.columns.toSet.intersect(right.columns.toSet) -- keyCols.toSet
    require(overlap.isEmpty,
      s"left/right column names overlap: $overlap — alias before joining")
    val b = "__graft_rj_bucket"
    val f = floor(col(startCol) / bucketWidth)
    val t = floor(col(endCol) / bucketWidth)
    // the guard rides INSIDE the exploded expression (raise_error in the
    // otherwise-branch), so it cannot be pruned away as an unused column
    // and costs nothing on the happy path
    val ok = col(endCol) >= col(startCol) && t - f < lit(maxBucketsPerInterval)
    val guarded = right.withColumn(b, explode(
      when(ok, sequence(f, t)).otherwise(
        raise_error(concat(
          lit("rangePointJoin: interval wider than " +
            s"$maxBucketsPerInterval buckets (or end < start) — raise " +
            "bucketWidth or split the interval: "),
          col(startCol).cast("string"), lit(".."),
          col(endCol).cast("string"))).cast("array<bigint>"))))
    val pts = left.withColumn(b, floor(col(pointCol) / bucketWidth))
    pts.join(guarded, keyCols :+ b)
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .drop(b)
  }
}
