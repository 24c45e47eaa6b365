package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared testdata readers for the query modules.
  *
  * The benchmark corpora are SINGLE-ROW-GROUP parquet files (one row group
  * per table at every scale factor), and a parquet scan cannot split inside
  * a row group — so a bare `read.parquet` yields ONE scan partition. For
  * operators whose per-row CPU dominates (MinHash signing, SimHash,
  * rolling-hash fingerprints, language-ID, exact cosine verification) that
  * serializes the whole query on a 32-core session — the optimization
  * guide's "input skew: one huge unsplittable file — repartition
  * immediately after the read" case (§2.5).
  *
  * [[parallel]] widens such scans to the session's default parallelism by
  * hash-repartitioning on the table's unique id. It is OPT-IN per query,
  * not blanket, because the r17 measurements were unambiguous both ways:
  * the CPU-heavy operators gained 1.5–3.5× (q35 4.9→1.1 s), while
  * scan-light aggregations/joins paid ~0.1–0.5 s of pure exchange overhead
  * for nothing (the 16-query relational gate regressed 9.1→14.2 s under a
  * blanket version of this change, and an all-columns hash key silently
  * killed PushedFilters/column pruning — 2–4× CPU). Single-column
  * deterministic keys keep filter pushdown and pruning intact, never use
  * `rand()` (retry-safe, SPARK-38388), and avoid round-robin's local sort
  * (SPARK-23207).
  *
  * The rule is scale-adaptive, not tuned to local[32]: a scan that already
  * has at least as many splits as the session has slots (any real
  * multi-file table at production scale) passes through untouched.
  */
private[queries] object Inputs {

  def raw(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Repartition `df` up to the session's default parallelism when its
    * scan yields fewer partitions (the unsplittable-input case); identity
    * otherwise. `key` must be a unique (or near-unique) column so the hash
    * spreads rows evenly. */
  def parallel(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(key))
  }
}
